package graft

import graft.streaming.AuditStream
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class AuditRec(topic: String, offset: Long, ts: Timestamp)

/** The AUDIT job type on a live stream: windowed counts + KMV approx-uniq
  * per topic, with bounded sketch state per (window, topic). The streaming
  * result must equal the batch run of the same operator on the same rows
  * (same hashes → same sketch → bit-identical estimate). */
class AuditStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val t0 = 1700000000000L
  private def recs: Seq[AuditRec] =
    (0 until 600).map { i =>
      // two topics, duplicate offsets every 3rd record, two 1-minute windows
      AuditRec(if (i % 2 == 0) "alpha" else "beta", (i / 3).toLong,
        new Timestamp(t0 + (if (i < 300) 0 else 61000) + (i % 50) * 100))
    }

  test("streaming windowed audit equals the batch run on the same rows") {
    val ms = MemoryStream[AuditRec](implicitly[Encoder[AuditRec]], spark.sqlContext)
    val audited = AuditStream.windowedAudit(ms.toDF(), "ts", "1 minute", "2 minutes")
    val q = audited.writeStream
      .format("memory").queryName("audit_out").outputMode("complete").start()
    try {
      // deliver across two micro-batches so partial sketches must merge in
      // the state store, not just map-side
      val (first, second) = recs.splitAt(250)
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()

      val streamed = spark.sql(
        "SELECT window_start, topic, n, approx_uniq FROM audit_out ORDER BY window_start, topic")
        .collect().map(_.toSeq).toSeq
      val batch = AuditStream.windowedAudit(recs.toDF(), "ts", "1 minute", "2 minutes")
        .orderBy("window_start", "topic").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.size == 4) // 2 windows x 2 topics

      // sketch estimate tracks the exact per-group distinct count (both
      // groups are below k=256 here, so the sketch is exhaustive = exact)
      val exact = recs.toDF().groupBy(
          org.apache.spark.sql.functions.window($"ts", "1 minute"), $"topic")
        .agg(org.apache.spark.sql.functions.countDistinct($"offset").as("e"))
        .select($"window.start", $"topic", $"e")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      streamed.foreach { case Seq(ws: Timestamp, topic: String, _, approx: Double) =>
        assert(approx == exact((ws, topic)).toDouble, s"$topic@$ws")
      }
    } finally q.stop()
  }
}
