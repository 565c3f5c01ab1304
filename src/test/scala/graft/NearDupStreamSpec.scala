package graft

import graft.streaming.NearDupStream
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

case class ArrivalDoc(doc_id: Long, text: String, ts: Timestamp)

/** The streaming LSH near-dup twin must reproduce batch q161 exactly on
  * replayed arrivals — across a checkpoint restart — and hold bounded
  * state (event-time eviction of bucket members). */
class NearDupStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stream ≡ q161 batch on replayed arrivals, checkpoint restart included") {
    val ops = graft.operators.SimilarityOps
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))

    // replay preconditions (see NearDupStream scaladoc): batch q161 drops
    // over-cap ARRIVAL buckets retroactively, a stream can only cap the
    // prefix — equal only when no arrival bucket exceeds the cap
    val arrivalSig = ops.q41Sig(spark, dir).filter(col("doc_id") % 5 === 0)
    val biggest = ops.bandedSigs(arrivalSig, ops.BandSize)
      .groupBy("band", "band_sig").agg(count(lit(1)).as("sz"))
      .agg(max("sz")).head().getLong(0)
    assert(biggest <= ops.MaxBucketSize,
      s"an arrival bucket of size $biggest exceeds the cap — stream ≡ batch " +
        "is not exact at this data scale")

    val snapshotDocs = docsDf.filter(col("doc_id") % 5 =!= 0)
    val table = NearDupStream.snapshotBandTable(snapshotDocs)
    val snapSh = NearDupStream.snapshotShingles(snapshotDocs).cache()

    // arrivals replayed in doc_id order (min-id-wins ≡ first-arrival-wins)
    val arrivals = docsDf.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text", "source").collect()
      .sortBy(_.getLong(0))
    val srcOf = arrivals.map(r => r.getLong(0) -> r.getString(2)).toMap
    val t0 = 1700000000000L
    val replay = arrivals.zipWithIndex.map { case (r, i) =>
      ArrivalDoc(r.getLong(0), r.getString(1), new Timestamp(t0 + i * 1000L))
    }
    val thirds = replay.grouped(math.max(replay.length / 3 + 1, 1)).toSeq

    val ckpt = Files.createTempDirectory("neardup_ckpt_").toString
    val results = scala.collection.concurrent.TrieMap.empty[Long, Array[(Long, String)]]
    val ms = MemoryStream[ArrivalDoc](implicitly[Encoder[ArrivalDoc]], spark.sqlContext)
    val verdicts = NearDupStream.bandVerdicts(ms.toDF(), table, "ts", 3600000L)
    def startQuery() = verdicts.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[NearDupStream.BandVerdict], id: Long) =>
        results(id) = NearDupStream.resolve(ds.toDF(), snapSh).collect()
          .map(r => r.getLong(0) -> r.getString(2))
      }
      .start()

    val q1 = startQuery()
    try {
      ms.addData(thirds(0).toSeq); q1.processAllAvailable()
      if (thirds.size > 1) { ms.addData(thirds(1).toSeq); q1.processAllAvailable() }
    } finally q1.stop()
    // restart from the checkpoint: committed batches must not re-emit,
    // bucket state must resume where it left off
    val q2 = startQuery()
    try {
      if (thirds.size > 2) thirds.drop(2).foreach { b =>
        ms.addData(b.toSeq); q2.processAllAvailable()
      }
      else q2.processAllAvailable()
    } finally q2.stop()

    // batchIds are unique; a replayed batch overwrites its own slot, so
    // the union is exactly one verdict per arrival
    val statuses = results.values.flatten.toMap
    assert(statuses.size == replay.length,
      s"${statuses.size} verdicts for ${replay.length} arrivals")

    val streamRollup = statuses.toSeq
      .groupBy { case (id, _) => srcOf(id) }
      .map { case (src, xs) =>
        src -> (xs.size.toLong,
          xs.count(_._2 == "kept").toLong,
          xs.count(_._2 == "dup_vs_old").toLong,
          xs.count(_._2 == "dup_within").toLong)
      }
    val batch = SparkEntry.queries("q161_incremental_neardup")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(streamRollup.keySet == batch.keySet)
    streamRollup.foreach { case (src, counts) =>
      assert(counts == batch(src),
        s"$src: stream $counts != batch q161 ${batch(src)}")
    }
    // the twin must actually exercise both dup paths on this corpus
    assert(statuses.values.exists(_ == "dup_vs_old"), "no dup_vs_old fired")
    assert(statuses.values.exists(_ == "dup_within"), "no dup_within fired")
    snapSh.unpersist()
  }

  test("bucket state is evicted by event-time timeout (bounded state)") {
    val emptySnapshot = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val table = NearDupStream.snapshotBandTable(emptySnapshot)
    val snapSh = NearDupStream.snapshotShingles(emptySnapshot)
    assert(table.isEmpty)

    val dup = "the same near duplicate text body, long enough to shingle meaningfully"
    val other = "a completely different filler document advancing the watermark only"
    val d = 60000L // watermark = eviction horizon
    val t0 = 1700000000000L

    val ckpt = Files.createTempDirectory("neardup_evict_").toString
    val results = scala.collection.concurrent.TrieMap.empty[Long, Array[(Long, String)]]
    val ms = MemoryStream[ArrivalDoc](implicitly[Encoder[ArrivalDoc]], spark.sqlContext)
    val q = NearDupStream.bandVerdicts(ms.toDF(), table, "ts", d).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[NearDupStream.BandVerdict], id: Long) =>
        results(id) = NearDupStream.resolve(ds.toDF(), snapSh).collect()
          .map(r => r.getLong(0) -> r.getString(2))
      }
      .start()
    try {
      // same text within the horizon → dup_within (state alive)
      ms.addData(Seq(ArrivalDoc(1L, dup, new Timestamp(t0)))); q.processAllAvailable()
      ms.addData(Seq(ArrivalDoc(2L, dup, new Timestamp(t0 + 1000)))); q.processAllAvailable()
      // fillers push the watermark past the buckets' timeout; the second
      // filler's batch runs with that watermark and evicts the state
      ms.addData(Seq(ArrivalDoc(3L, other, new Timestamp(t0 + 3 * d)))); q.processAllAvailable()
      ms.addData(Seq(ArrivalDoc(4L,
        "unrelated second filler: entirely disjoint vocabulary keeps jaccard at zero",
        new Timestamp(t0 + 3 * d + 100))))
      q.processAllAvailable()
      // same text again, AFTER eviction → kept: the bucket forgot doc 1/2,
      // which is exactly the bounded-state contract
      ms.addData(Seq(ArrivalDoc(5L, dup, new Timestamp(t0 + 3 * d + 2000))))
      q.processAllAvailable()
    } finally q.stop()

    val statuses = results.values.flatten.toMap
    assert(statuses == Map(
      1L -> "kept", 2L -> "dup_within", 3L -> "kept", 4L -> "kept", 5L -> "kept"),
      s"got $statuses")
  }
}
