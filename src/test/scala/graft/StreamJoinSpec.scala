package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class FetchRec(msgId: String, fetchTs: Timestamp)
case class AckRec(msgId: String, ackTs: Timestamp, code: String)

/** Stream-stream interval join: live end-to-end latency pairing of the
  * fetch stream with the ack stream, with bounded state. */
class StreamJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val t0 = 1700000000000L

  test("interval join pairs acks that land within the horizon, drops the rest") {
    val fetches = MemoryStream[FetchRec](implicitly[Encoder[FetchRec]], spark.sqlContext)
    val acks = MemoryStream[AckRec](implicitly[Encoder[AckRec]], spark.sqlContext)
    val joined = StreamJoin.intervalJoin(
      fetches.toDF(), acks.toDF(), Seq("msgId"),
      "fetchTs", "ackTs", "1 minute", "1 minute", "5 minutes")
    val q = joined.writeStream
      .format("memory").queryName("sj_out").outputMode("append").start()
    try {
      fetches.addData(Seq(
        FetchRec("a", new Timestamp(t0)),
        FetchRec("b", new Timestamp(t0)),
        FetchRec("c", new Timestamp(t0))))
      acks.addData(Seq(
        AckRec("a", new Timestamp(t0 + 3000), "COMMIT"), // in horizon
        AckRec("b", new Timestamp(t0 + 10 * 60 * 1000), "COMMIT"), // beyond horizon
        AckRec("d", new Timestamp(t0 + 2000), "COMMIT"))) // no fetch side
      q.processAllAvailable()
      // advance both watermarks far enough to finalize results
      fetches.addData(Seq(FetchRec("wm", new Timestamp(t0 + 30 * 60 * 1000))))
      acks.addData(Seq(AckRec("wm2", new Timestamp(t0 + 30 * 60 * 1000), "COMMIT")))
      q.processAllAvailable()

      val out = spark.sql("SELECT msgId, code FROM sj_out").collect()
      assert(out.map(_.getString(0)).toSeq == Seq("a"))
      assert(out.head.getString(1) == "COMMIT")
    } finally q.stop()
  }

  test("join state is bounded: stored rows are evicted past watermark + horizon") {
    val fetches = MemoryStream[FetchRec](implicitly[Encoder[FetchRec]], spark.sqlContext)
    val acks = MemoryStream[AckRec](implicitly[Encoder[AckRec]], spark.sqlContext)
    val joined = StreamJoin.intervalJoin(
      fetches.toDF(), acks.toDF(), Seq("msgId"),
      "fetchTs", "ackTs", "1 minute", "1 minute", "5 minutes")
    val q = joined.writeStream
      .format("memory").queryName("sj_state").outputMode("append").start()
    try {
      // 50 fetches at t0, no acks — they sit in state
      fetches.addData((1 to 50).map(i => FetchRec(s"m$i", new Timestamp(t0))))
      acks.addData(Seq(AckRec("x", new Timestamp(t0), "COMMIT")))
      q.processAllAvailable()
      // push both watermarks an hour ahead: all t0 state must be evicted
      fetches.addData(Seq(FetchRec("adv", new Timestamp(t0 + 3600 * 1000))))
      acks.addData(Seq(AckRec("adv2", new Timestamp(t0 + 3600 * 1000), "COMMIT")))
      q.processAllAvailable()
      val rows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(rows < 10, s"state not evicted: $rows rows still stored")
    } finally q.stop()
  }

  test("batch fallback: same call on batch frames applies the interval predicate") {
    val f = Seq(FetchRec("a", new Timestamp(t0)), FetchRec("b", new Timestamp(t0))).toDF()
    val a = Seq(
      AckRec("a", new Timestamp(t0 + 1000), "COMMIT"),
      AckRec("b", new Timestamp(t0 + 10 * 60 * 1000), "COMMIT")).toDF()
    val out = StreamJoin.intervalJoin(f, a, Seq("msgId"),
      "fetchTs", "ackTs", "1 minute", "1 minute", "5 minutes")
    assert(out.select("msgId").as[String].collect().toSeq == Seq("a"))
  }
}
