package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class IngestRec(msgId: String, ts: Timestamp, payload: String)

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

  test("batch fallback: same call on a batch frame dedups on the keys") {
    val df = Seq(
      IngestRec("x", new Timestamp(0L), "p1"),
      IngestRec("x", new Timestamp(1000L), "p2"),
      IngestRec("y", new Timestamp(2000L), "p3")).toDF()
    val out = StreamDedup.withinWatermark(df, "ts", "10 minutes", Seq("msgId"))
    assert(out.count() == 2)
  }
}
