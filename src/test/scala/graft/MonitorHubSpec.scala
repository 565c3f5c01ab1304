package graft

import graft.control.{JobManager, MonitorHub, StatusServer}
import graft.streaming.{DriftStream, HotKeyStream}
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The live monitors land on the management surface: DriftStream windows
  * pushed through a MonitorHub foreachBatch sink are served as JSON by
  * /status/monitors, kind-filtered and TTL-bounded. */
class MonitorHubSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val t0 = 1699999980000L // minute-aligned

  private def httpGet(port: Int, path: String): String = {
    val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    try new String(conn.getInputStream.readAllBytes(), "UTF-8") finally conn.disconnect()
  }

  test("drift windows stream into the hub and serve over /status/monitors") {
    val hub = new MonitorHub()
    val ms = MemoryStream[DriftRec](implicitly[Encoder[DriftRec]], spark.sqlContext)
    val ref = Map(0L -> 10L, 1L -> 10L)
    val q = DriftStream.windowedDrift(ms.toDF(), "ts", "1 minute", "2 minutes", ref)
      .writeStream.outputMode("complete")
      .foreachBatch(hub.sink("drift") _)
      .start()
    hub.trackState("drift", q)
    val srv = new StatusServer(new JobManager(null), monitors = Some(hub))
    val port = srv.start()
    try {
      ms.addData(Seq(
        DriftRec("alpha", 0L, new Timestamp(t0)),
        DriftRec("alpha", 1L, new Timestamp(t0 + 1000)),
        DriftRec("beta", 1L, new Timestamp(t0 + 2000))))
      q.processAllAvailable()

      val drift = httpGet(port, "/status/monitors?kind=drift")
      assert(drift.contains("\"topic\":\"alpha\"") && drift.contains("\"topic\":\"beta\""))
      assert(drift.contains("\"chi2_millis\":"))
      assert(drift.contains(s"\"window_start\":$t0"))

      // a second trigger on the SAME window overwrites, not duplicates
      ms.addData(Seq(DriftRec("alpha", 0L, new Timestamp(t0 + 3000))))
      q.processAllAvailable()
      val again = httpGet(port, "/status/monitors?kind=drift")
      assert(again.split("\"topic\":\"alpha\"").length == 2, s"duplicate window row: $again")
      assert(again.contains("\"cur_n\":3")) // alpha window grew 2 -> 3

      // hot-key candidates ride the same surface under their own kind
      val keyed = Seq(
        KeyRec("alpha", 7L, new Timestamp(t0)),
        KeyRec("alpha", 7L, new Timestamp(t0 + 500)),
        KeyRec("alpha", 9L, new Timestamp(t0 + 900)))
      hub.sink("hotkeys")(
        HotKeyStream.windowedHotKeys(keyed.toDF(), "ts", "1 minute", "2 minutes", 4), 0L)
      val all = httpGet(port, "/status/monitors")
      assert(all.contains("\"drift\":[") && all.contains("\"hotkeys\":["))
      assert(all.contains("\"candidates\":[7,9]"))
      assert(hub.kinds == Seq("drift", "hotkeys"))
      // per-monitor state telemetry: the tracked drift query's windowed
      // aggregation holds live state rows, served on the same surface
      val m = "\"state_rows\":\\{\"drift\":(-?\\d+)\\}".r.findFirstMatchIn(all)
      assert(m.isDefined, s"state_rows missing from /status/monitors: $all")
      assert(m.get.group(1).toLong > 0L,
        s"tracked monitor reports no state rows: ${m.get.group(1)}")
    } finally { q.stop(); srv.stop() }
  }

  test("tokenizer fertility windows ride the surface keyed by source") {
    val hub = new MonitorHub()
    val ms = MemoryStream[TokRec](implicitly[Encoder[TokRec]], spark.sqlContext)
    val q = graft.streaming.TokenizerStream.windowedFertility(
        ms.toDF(), "ts", "1 minute", "2 minutes",
        Seq(("t", "h")), Map("src_a" -> 1500L), 300L)
      .writeStream.outputMode("complete")
      .foreachBatch(hub.sink("tokenizer", keyCol = "source") _)
      .start()
    val srv = new StatusServer(new JobManager(null), monitors = Some(hub))
    val port = srv.start()
    try {
      ms.addData(Seq(
        TokRec("src_a", "the thin", new Timestamp(t0)),
        TokRec("src_b", "zork quux", new Timestamp(t0 + 1000))))
      q.processAllAvailable()
      val tok = httpGet(port, "/status/monitors?kind=tokenizer")
      assert(tok.contains("\"source\":\"src_a\"") && tok.contains("\"source\":\"src_b\""))
      assert(tok.contains("\"fertility_permille\":"))
      // src_b has no baseline: null fields serve as JSON null, flag false
      assert(tok.contains("\"baseline_permille\":null"))
      assert(hub.kinds == Seq("tokenizer"))
    } finally { q.stop(); srv.stop() }
  }

  test("monitor windows age out of the hub at the TTL") {
    var now = 1000000L
    val hub = new MonitorHub(ttlMs = 5000L, clock = () => now)
    val frame = Seq(DriftRec("t", 0L, new Timestamp(t0))).toDF()
      .selectExpr("timestamp_millis(" + t0 + ") AS window_start", "'t' AS topic", "1L AS cur_n")
    hub.sink("drift")(frame, 0L)
    assert(hub.json("drift").contains("\"cur_n\":1"))
    now += 6000L
    assert(hub.json("drift") == "[]")
    assert(hub.kinds.isEmpty)
  }
}
