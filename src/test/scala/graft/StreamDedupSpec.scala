package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class IngestRec(msgId: String, ts: Timestamp, payload: String)
case class DigestRec(digest: Long, ts: Timestamp)

/** Cross-micro-batch redelivery dedup: the same logical message arriving in
  * a later batch (at-least-once redelivery) must be emitted exactly once,
  * while state for keys older than the watermark is dropped. */
class StreamDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("streaming dedup drops cross-batch redeliveries within the watermark") {
    val ms = MemoryStream[IngestRec](implicitly[Encoder[IngestRec]], spark.sqlContext)
    val deduped = StreamDedup.withinWatermark(
      ms.toDF(), "ts", "10 minutes", Seq("msgId"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      ms.addData(Seq(
        IngestRec("a", new Timestamp(t0), "first"),
        IngestRec("b", new Timestamp(t0 + 1000), "first")))
      q.processAllAvailable()
      // redelivery of "a" in a later batch + a fresh key
      ms.addData(Seq(
        IngestRec("a", new Timestamp(t0 + 2000), "redelivered"),
        IngestRec("c", new Timestamp(t0 + 3000), "first")))
      q.processAllAvailable()

      val out = spark.sql("SELECT msgId, payload FROM dedup_out").collect()
      assert(out.map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"))
      // the kept "a" is the FIRST arrival, not the redelivery
      assert(out.find(_.getString(0) == "a").get.getString(1) == "first")
    } finally q.stop()
  }

  test("snapshot-aware dedup: bloom drops snapshot dups, watermark drops stream dups") {
    import graft.functions.BloomSketch
    // the deduped snapshot: digests 1000..1099; 1024-bit / 5-probe filter
    val snapshotKeys = (1000L until 1100L)
    val bloom = new BloomSketch(1024, 5)
    val bits = snapshotKeys.foldLeft(bloom.zero)(bloom.reduce).toSeq
    // fresh digests, chosen to NOT false-positive against this filter (the
    // probe arithmetic is deterministic, so the choice is stable)
    val fresh = (1L to 400L).filterNot { k =>
      (0 until 5).forall { i =>
        val bit = BloomSketch.probeBit(k, i, 1024)
        (bits(bit >>> 6) >> (bit & 63) & 1L) == 1L
      }
    }.take(3)
    assert(fresh.size == 3, "need 3 non-colliding fresh digests")

    val ms = MemoryStream[DigestRec](implicitly[Encoder[DigestRec]], spark.sqlContext)
    val out = StreamDedup.againstSnapshot(ms.toDF(), "ts", "10 minutes", "digest", bits, 5)
    val q = out.writeStream
      .format("memory").queryName("snap_dedup_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      ms.addData(Seq(
        DigestRec(snapshotKeys.head, new Timestamp(t0)), // dup of snapshot
        DigestRec(fresh(0), new Timestamp(t0 + 1000)),
        DigestRec(fresh(1), new Timestamp(t0 + 2000))))
      q.processAllAvailable()
      ms.addData(Seq(
        DigestRec(fresh(0), new Timestamp(t0 + 3000)), // dup within stream
        DigestRec(snapshotKeys.last, new Timestamp(t0 + 4000)), // snapshot dup
        DigestRec(fresh(2), new Timestamp(t0 + 5000))))
      q.processAllAvailable()

      val kept = spark.sql("SELECT digest FROM snap_dedup_out")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == fresh.sorted, s"kept $kept, expected ${fresh.sorted}")
    } finally q.stop()
  }

  test("snapshot dups can never leak through (no false negatives)") {
    import graft.functions.BloomSketch
    val snapshotKeys = (0L until 5000L).map(k => k * 2654435761L % (1L << 60))
    val bloom = new BloomSketch(65536, 7)
    val bits = snapshotKeys.foldLeft(bloom.zero)(bloom.reduce).toSeq
    val df = snapshotKeys.map(k => DigestRec(k, new Timestamp(k % 100000))).toDF()
    val out = StreamDedup.againstSnapshot(df, "ts", "10 minutes", "digest", bits, 7)
    assert(out.count() == 0, "a snapshot digest survived its own bloom filter")
  }

  test("batch fallback: same call on a batch frame dedups on the keys") {
    val df = Seq(
      IngestRec("x", new Timestamp(0L), "p1"),
      IngestRec("x", new Timestamp(1000L), "p2"),
      IngestRec("y", new Timestamp(2000L), "p3")).toDF()
    val out = StreamDedup.withinWatermark(df, "ts", "10 minutes", Seq("msgId"))
    assert(out.count() == 2)
  }
}
