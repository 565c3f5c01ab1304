package graft

import graft.control._
import org.scalatest.funsuite.AnyFunSuite

/** JobStatus history store: cadence-gated ingest, TTL retention, and the
  * scaler-driven-from-the-store contract (reference: the master's
  * StoredJobStatus store, ControllerWorkerService.java:46-260; job-status
  * TTL 1 h). */
class JobStatusStoreSpec extends AnyFunSuite {

  private def rec(g: String, ts: Long, msgs: Double = 1000.0): JobStatusRecord =
    JobStatusRecord(g, "RUNNING", readOffset = ts, commitOffset = ts - 10,
      messagesPerSec = msgs, bytesPerSec = msgs * 100,
      totalMessagesInflight = 5L, totalBytesInflight = 500L,
      cpuUsage = 0.5, recordsProduced = 0L, tsMs = ts)

  test("ingest is cadence-gated; history retains in order; TTL expires") {
    var now = 0L
    val store = new JobStatusStore(ttlMs = 10000L, cadenceMs = 1000L, clock = () => now)
    now = 1000L
    assert(store.ingest(rec("g1", 1000L)))
    // a heartbeat 400ms later is coalesced away (reference cadence 1 s)
    assert(!store.ingest(rec("g1", 1400L)))
    now = 2000L
    assert(store.ingest(rec("g1", 2000L)))
    now = 3000L
    assert(store.ingest(rec("g2", 3000L)))
    assert(store.groups == Seq("g1", "g2"))
    assert(store.history("g1").map(_.tsMs) == Seq(1000L, 2000L))
    assert(store.latest("g1").map(_.readOffset).contains(2000L))
    // the full proto field set survives the store
    val r = store.latest("g2").get
    assert(r.commitOffset == 2990L && r.totalMessagesInflight == 5L &&
      r.cpuUsage == 0.5 && r.bytesPerSec == 100000.0)
    // TTL: g1's records age out (10s TTL), g2's most recent survives
    now = 12500L
    assert(store.history("g1").isEmpty, "expired history must purge")
    assert(store.history("g2").map(_.tsMs) == Seq(3000L))
    assert(store.groups == Seq("g2"))
  }

  test("backward clock step is accepted, not a starvation gate; purge clears cursors") {
    var now = 0L
    val store = new JobStatusStore(ttlMs = 10000L, cadenceMs = 1000L, clock = () => now)
    now = 60000L
    assert(store.ingest(rec("g", 60000L)))
    // worker clock steps BACK 30s (NTP correction): the heartbeat must land
    now = 61000L
    assert(store.ingest(rec("g", 31000L)), "backward step must not be gated")
    // and the scaler feed follows the clock back instead of starving
    val scaler = new AutoScaler(AutoScaler.Config(calibrateMs = 0L))
    assert(store.driveScaler(scaler, "g").isDefined)
    now = 62000L
    assert(store.ingest(rec("g", 32000L)))
    assert(store.driveScaler(scaler, "g").isDefined, "post-step samples keep feeding")
    // full expiry removes the group AND its cadence/feed cursors: a reused
    // group id starts fresh instead of inheriting a stale gate
    now = 80000L
    store.purge()
    assert(store.groups.isEmpty)
    assert(store.ingest(rec("g", 100L)), "reused id must not inherit a stale cadence gate")
  }

  test("driveScaler feeds each retained sample exactly once, in order") {
    var now = 0L
    val store = new JobStatusStore(ttlMs = 3600000L, cadenceMs = 1000L, clock = () => now)
    val fromStore = new AutoScaler(AutoScaler.Config(calibrateMs = 0L))
    val direct = new AutoScaler(AutoScaler.Config(calibrateMs = 0L))
    val samples = Seq(1000L -> 4000.0, 2000L -> 8000.0, 3000L -> 16000.0)
    samples.foreach { case (ts, msgs) => now = ts; store.ingest(rec("g", ts, msgs)) }
    // store-driven and directly-fed scalers see the same sample sequence ->
    // identical decisions (the "no ad-hoc snapshots" guarantee)
    val viaStore = store.driveScaler(fromStore, "g")
    val viaDirect = samples.map { case (ts, msgs) =>
      direct.onSample("g", msgs, msgs * 100, ts)
    }.last
    assert(viaStore.contains(viaDirect))
    assert(fromStore.state("g") == direct.state("g"))
    // idempotent: no new samples -> no decision, state untouched
    assert(store.driveScaler(fromStore, "g").isEmpty)
    assert(fromStore.state("g") == direct.state("g"))
    // a fresh sample resumes from where feeding left off
    now = 4000L
    store.ingest(rec("g", 4000L, 16000.0))
    assert(store.driveScaler(fromStore, "g").isDefined)
    assert(fromStore.state("g") ==
      { direct.onSample("g", 16000.0, 1600000.0, 4000L); direct.state("g") })
  }

  test("status server serves the history store") {
    var now = 1000L
    val store = new JobStatusStore(ttlMs = 3600000L, cadenceMs = 0L, clock = () => now)
    store.ingest(rec("hist__g", 1000L))
    now = 2000L
    store.ingest(rec("hist__g", 2000L))
    val srv = new StatusServer(new JobManager(null), statusStore = Some(store))
    val port = srv.start()
    try {
      val url = java.net.URI.create(s"http://127.0.0.1:$port/status/history").toURL
      val in = url.openStream()
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val parsed = org.json4s.jackson.JsonMethods.parse(body)
      val entry = parsed.children.head
      assert((entry \ "jobGroupId").values == "hist__g")
      val hist = (entry \ "history").children
      assert(hist.size == 2)
      assert((hist.head \ "readOffset").values == BigInt(1000))
      assert((hist.last \ "commitOffset").values == BigInt(1990))
      assert((hist.last \ "cpuUsage").values == 0.5)
      // the HTML debug shell serves and references every JSON endpoint
      val durl = java.net.URI.create(s"http://127.0.0.1:$port/debug").toURL
      val conn = durl.openConnection()
      val din = conn.getInputStream
      val html = try new String(din.readAllBytes(), "UTF-8") finally din.close()
      assert(conn.getContentType.startsWith("text/html"))
      Seq("/status/jobs", "/status/workers", "/status/scaler", "/status/history")
        .foreach(ep => assert(html.contains(ep), s"debug page must fetch $ep"))
    } finally srv.stop()
  }
}
