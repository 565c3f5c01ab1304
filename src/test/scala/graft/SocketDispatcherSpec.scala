package graft

import graft.model._
import graft.streaming._
import graft.streaming.ForwardingEngine._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Per-payload sighting counts for the socket consumer (single-JVM local
  * mode): lets a handler stall only the FIRST delivery of a payload —
  * a transient network stall — and serve redeliveries normally. */
object SocketWorld {
  val seen = new ConcurrentHashMap[String, AtomicInteger]()
  def sighting(payload: String): Int =
    seen.computeIfAbsent(payload, _ => new AtomicInteger()).incrementAndGet()
  def reset(): Unit = seen.clear()
}

/** E2E deadline semantics against REAL socket I/O: rpc_timeout_ms measured
  * on the wire, overdue→BACKOFF→retry-tier routing driven by an induced
  * network stall, UNAVAILABLE from an actual refused connection — the
  * behaviors the in-process mock dispatchers can only model
  * (reference: GrpcDispatcher.java:126-199 deadline handling). */
class SocketDispatcherSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val topic = "sock-topic"
  private val group = "sock-group"

  private def spec1: JobSpec = JobSpec(
    jobGroupId = s"${topic}__$group", cluster = "local-cluster",
    topic = topic, consumerGroup = group,
    rpc = RpcSpec("grpc://consumer", s"kafka.consumerproxy.$group/$topic",
      maxRpcTimeouts = 2, dlqTopic = TopicNames.dlq(topic, group)),
    retryEnabled = true,
    retryTiers = Seq(RetryTier(TopicNames.retry(topic, group, 1), 1000L, 1)))

  private def recs(msgs: Seq[(String, String)], t: String = topic): Dataset[KafkaRecord] =
    spark.createDataset(msgs.zipWithIndex.map { case ((k, v), i) =>
      KafkaRecord(k.getBytes("UTF-8"), v.getBytes("UTF-8"), t, 0, i.toLong,
        1700000000000000000L + i, Map.empty)
    })

  test("happy path over real sockets: every message commits, connections are pooled") {
    val server = new SocketConsumerServer(_ => DispatchResult(GrpcStatus.OK, None, overdue = false))
    try {
      val f = SocketDispatcherFactory("127.0.0.1", server.port, rpcTimeoutMs = 5000)
      val n = 200
      val out = ForwardingEngine.processBatch(
        spec1, f, "local-cluster", recs((1 to n).map(i => (s"k$i", s"m$i")))).collect()
      assert(out.length == n)
      assert(out.forall(_.code == "COMMIT"), out.map(_.code).distinct.mkString(","))
      // pooling: the dispatcher reuses idle connections across RPCs, so the
      // server accepts at most ~max-concurrency sockets, far under one per
      // message (the per-RPC-dial anti-pattern)
      assert(server.acceptedConnections.get() < n,
        s"dialed ${server.acceptedConnections.get()} connections for $n messages — pool not reusing")
    } finally server.close()
  }

  test("induced network stall: wire deadline → BACKOFF → retry tier, redelivery commits E2E") {
    SocketWorld.reset()
    val server = new SocketConsumerServer(req => {
      val p = new String(req.payload, "UTF-8")
      // transient stall: the FIRST delivery of the marked payload hangs far
      // past the client's deadline (the reply below lands on a connection
      // the client has already abandoned); redeliveries answer promptly
      if (p == "slow" && SocketWorld.sighting(p) == 1) Thread.sleep(800)
      DispatchResult(GrpcStatus.OK, None, overdue = false)
    })
    try {
      val f = SocketDispatcherFactory("127.0.0.1", server.port, rpcTimeoutMs = 150)
      val round1 = ForwardingEngine.processBatch(
        spec1, f, "local-cluster",
        recs(Seq(("k1", "fast1"), ("k2", "slow"), ("k3", "fast2")))).collect()
      // healthy siblings are not held hostage by the stalled message
      assert(round1.count(_.code == "COMMIT") == 2)
      // the stalled message hit its wire deadline: DEADLINE_EXCEEDED maps to
      // BACKOFF, escalateBackoff (timeoutCount 0 < maxRpcTimeouts) → RETRY
      // into tier 1, with the timeout counter incremented on the way out
      val stalled = round1.find(o => o.code != "COMMIT").get
      assert(stalled.code == "RETRY", stalled.code)
      assert(stalled.destination == TopicNames.retry(topic, group, 1))
      assert(stalled.timeoutCount == 1L)
      // replay the routed record from the tier topic (the retry fetcher's
      // role): the stall was transient, so this delivery commits
      val replay = ForwardingEngine.processBatch(
        spec1, f, "local-cluster",
        spark.createDataset(Seq(KafkaRecord(
          stalled.outKey, stalled.outValue, stalled.destination, 0, 0L,
          1700000000000000000L, Map.empty)))).collect()
      assert(replay.length == 1 && replay.head.code == "COMMIT",
        replay.map(o => (o.code, o.destination)).mkString(","))
    } finally server.close()
  }

  test("framing round-trips arbitrary payload bytes and headers") {
    // the server echoes what it decoded back through the status/action
    // fields, so a mismatch anywhere in the framing (UTF headers, length-
    // prefixed binary payload incl. 0x00/0xFF bytes and empty payloads)
    // surfaces as a wrong digest rather than a hang
    def digest(req: DispatchRequest): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      req.headers.toSeq.sortBy(_._1).foreach { case (k, v) =>
        md.update(k.getBytes("UTF-8")); md.update(v.getBytes("UTF-8")) }
      md.update(req.payload)
      md.digest().map("%02x".format(_)).mkString
    }
    val server = new SocketConsumerServer(req =>
      DispatchResult(digest(req), Some(s"len=${req.payload.length}"), overdue = false))
    try {
      val d = new SocketDispatcher("127.0.0.1", server.port, rpcTimeoutMs = 5000)
      try {
        val rng = new scala.util.Random(42)
        for (i <- 0 until 50) {
          val payload = new Array[Byte](rng.nextInt(4096))
          rng.nextBytes(payload)
          val headers = (0 until rng.nextInt(6)).map(j =>
            s"h$j" -> rng.nextString(rng.nextInt(32))).toMap
          val req = DispatchRequest(payload, headers)
          val res = d.dispatch(req)
          assert(res.statusCode == digest(req), s"iteration $i framing mismatch")
          assert(res.action.contains(s"len=${payload.length}"))
          assert(!res.overdue)
        }
      } finally d.close()
    } finally server.close()
  }

  test("refused connection: UNAVAILABLE (not overdue) → in-memory retry → INVALID, no produce") {
    // bind-then-close guarantees a port with nothing listening
    val probe = new java.net.ServerSocket(0)
    val deadPort = probe.getLocalPort
    probe.close()
    val f = SocketDispatcherFactory("127.0.0.1", deadPort, rpcTimeoutMs = 2000)
    val out = ForwardingEngine.processBatch(
      spec1, f, "local-cluster", recs(Seq(("k1", "m1")))).collect()
    // connect is refused instantly — well inside the deadline — so the
    // result is UNAVAILABLE+!overdue → INVALID: retried in memory, acked
    // without any queue produce (poison handling stays in the worker)
    assert(out.length == 1 && out.head.code == "INVALID" && out.head.destination == "")
  }
}
