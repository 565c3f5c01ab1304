package graft

import graft.streaming.HotKeyStream
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class KeyRec(topic: String, user_id: java.lang.Long, ts: Timestamp)

/** Live hot-key candidates: the MG sketch as a windowed streaming agg.
  * The streaming result must equal the batch run on the same rows, the
  * candidate set must contain every key above the n/(k+1) guarantee, and
  * null keys must be excluded (the q64 precondition). */
class HotKeyStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val t0 = 1700000000000L
  /** One hot key (id 7, ~1/3 of rows) among a long tail, two topics, two
    * 1-minute windows, plus a few null keys that must be ignored. */
  private def recs: Seq[KeyRec] =
    (0 until 900).map { i =>
      val id: java.lang.Long =
        if (i % 9 == 8) null
        else if (i % 3 == 0) 7L
        else 100L + (i % 40)
      KeyRec(if (i % 2 == 0) "alpha" else "beta", id,
        new Timestamp(t0 + (if (i < 450) 0 else 61000) + (i % 50) * 100))
    }

  test("streaming windowed hot-key sketch equals the batch run on the same rows") {
    val ms = MemoryStream[KeyRec](implicitly[Encoder[KeyRec]], spark.sqlContext)
    val hot = HotKeyStream.windowedHotKeys(ms.toDF(), "ts", "1 minute", "2 minutes", 15)
    val q = hot.writeStream
      .format("memory").queryName("hotkeys_out").outputMode("complete").start()
    try {
      // two micro-batches: stored sketches must merge with later partials
      val (first, second) = recs.splitAt(400)
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()

      // MG candidate SETS are merge-order-dependent (that is why q64
      // verifies candidates exactly afterward), so stream ≡ batch is
      // asserted on the DETERMINISTIC parts — group keys and counts — and
      // both paths must honor the sketch's frequency guarantee below
      val streamed = spark.sql(
        "SELECT window_start, topic, n FROM hotkeys_out ORDER BY window_start, topic")
        .collect().map(_.toSeq).toSeq
      val batchDf = HotKeyStream.windowedHotKeys(recs.toDF(), "ts", "1 minute", "2 minutes", 15)
      val batch = batchDf.select($"window_start", $"topic", $"n")
        .orderBy("window_start", "topic").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.size == 4) // 2 windows x 2 topics

      // the MG guarantee on BOTH paths: every key with freq > n/(k+1) is
      // in the candidates; the 15-counter sketch over 40 tail keys + the
      // hot key must keep each group's candidate list within k
      val guarantee = (rows: Array[org.apache.spark.sql.Row]) => rows.foreach { r =>
        val n = r.getLong(1)
        val cands = r.getSeq[Long](2).toSet
        assert(cands.contains(7L), s"hot key missing in ${r.getString(0)} (n=$n)")
        assert(cands.size <= 15)
      }
      guarantee(spark.sql("SELECT topic, n, candidates FROM hotkeys_out").collect())
      guarantee(batchDf.select($"topic", $"n", $"candidates").collect())
    } finally q.stop()
  }

  test("null keys never surface as candidates") {
    val batch = HotKeyStream.windowedHotKeys(recs.toDF(), "ts", "1 minute", "2 minutes", 15)
    val allCands = batch.select($"candidates").as[Seq[Long]].collect().flatten.toSet
    assert(!allCands.contains(0L) || recs.exists(r => r.user_id != null && r.user_id == 0L))
    // row counts exclude nulls: n must equal the non-null row count
    val n = batch.agg(org.apache.spark.sql.functions.sum($"n")).head().getLong(0)
    assert(n == recs.count(_.user_id != null))
  }
}
