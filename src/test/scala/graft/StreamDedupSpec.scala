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

  test("rolling kept digests into the snapshot bits ≡ recomputing the filter (lossless OR)") {
    import graft.functions.BloomSketch
    // the daily loop on the Bloom state form: day 1's kept output folds
    // into the snapshot bits WITHOUT rescanning the old corpus, and the
    // rolled filter is BIT-IDENTICAL to one rebuilt from old ∪ kept —
    // per-key bit-setting is independent, so OR is exact, not approximate
    val m = 4096; val probes = 5
    val baseKeys = (2000L until 2300L)
    val bloom = new BloomSketch(m, probes)
    val baseBits = baseKeys.foldLeft(bloom.zero)(bloom.reduce).toSeq

    def inFilter(bits: Seq[Long], k: Long): Boolean = (0 until probes).forall { i =>
      val bit = BloomSketch.probeBit(k, i, m)
      (bits(bit >>> 6) >> (bit & 63) & 1L) == 1L
    }
    // day-1 arrivals: two base dups + three fresh keys (non-colliding)
    val fresh1 = (1L to 500L).filterNot(inFilter(baseBits, _)).take(3)
    val day1 = Seq(baseKeys.head, baseKeys.last) ++ fresh1
    // the day-1 stream's own kept output (batch form is equivalent here)
    val kept1 = StreamDedup.againstSnapshot(
        day1.zipWithIndex.map { case (k, i) => DigestRec(k, new Timestamp(1700000000000L + i * 1000L)) }.toDF(),
        "ts", "10 minutes", "digest", baseBits, probes)
      .collect().map(_.getAs[Long]("digest")).toSeq
    assert(kept1.sorted == fresh1.sorted)

    // ROLL vs RECOMPUTE: bitwise equality of the two filters
    val rolled = StreamDedup.rollSnapshotBits(baseBits, kept1, probes)
    val recomputed = (baseKeys ++ kept1).foldLeft(bloom.zero)(bloom.reduce).toSeq
    assert(rolled == recomputed, "rolled bits diverged from a full recompute")

    // day 2 behaves identically under either filter: day-1 kept keys are
    // now snapshot dups, genuinely-new keys survive
    val fresh2 = (500L to 1500L).filterNot(inFilter(rolled, _)).take(2)
    val day2 = Seq(fresh1.head, baseKeys.head) ++ fresh2
    def runDay2(bits: Seq[Long]): Seq[Long] = StreamDedup.againstSnapshot(
        day2.zipWithIndex.map { case (k, i) => DigestRec(k, new Timestamp(1700003600000L + i * 1000L)) }.toDF(),
        "ts", "10 minutes", "digest", bits, probes)
      .collect().map(_.getAs[Long]("digest")).sorted.toSeq
    assert(runDay2(rolled) == fresh2.sorted)
    assert(runDay2(rolled) == runDay2(recomputed))
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
