package graft

import graft.model._
import graft.streaming._
import graft.streaming.ForwardingEngine._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The pipelined dispatcher: many in-flight frames per connection with
  * FIFO-per-connection response correlation — the wire shape the reference
  * gets from HTTP/2 stream multiplexing (2,000 concurrent streams per
  * pipeline, application-uforwarder-worker.yaml:77). These cases prove the
  * correlation is REAL (every concurrent caller gets its own request's
  * answer, not a neighbor's), that a deadline poisons only its own
  * connection and the dispatcher recovers, and that the full engine path
  * routes identically through the pipelined and sync dispatchers. */
class PipelinedDispatchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val topic = "pipe-topic"
  private val group = "pipe-group"

  private def spec1: JobSpec = JobSpec(
    jobGroupId = s"${topic}__$group", cluster = "local-cluster",
    topic = topic, consumerGroup = group,
    rpc = RpcSpec("grpc://consumer", s"kafka.consumerproxy.$group/$topic",
      maxRpcTimeouts = 2, dlqTopic = TopicNames.dlq(topic, group)),
    retryEnabled = true,
    retryTiers = Seq(RetryTier(TopicNames.retry(topic, group, 1), 1000L, 1)))

  /** Echo server: the status is a digest of the request, so a response
    * delivered to the WRONG caller (a FIFO correlation bug) is a visible
    * mismatch, never a silent pass. */
  private def digest(req: DispatchRequest): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    req.headers.toSeq.sortBy(_._1).foreach { case (k, v) =>
      md.update(k.getBytes("UTF-8")); md.update(v.getBytes("UTF-8")) }
    md.update(req.payload)
    md.digest().map("%02x".format(_)).mkString
  }

  test("concurrent callers each get their own response over 4 multiplexed connections") {
    val server = new SocketConsumerServer(req =>
      DispatchResult(digest(req), Some(s"len=${req.payload.length}"), overdue = false))
    try {
      val d = new PipelinedSocketDispatcher("127.0.0.1", server.port,
        rpcTimeoutMs = 5000, connections = 4)
      try {
        val threads = 16
        val perThread = 250
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val ts = (0 until threads).map { t =>
          val th = new Thread(() => {
            val rng = new scala.util.Random(1000 + t)
            for (i <- 0 until perThread) {
              val payload = new Array[Byte](1 + rng.nextInt(2048))
              rng.nextBytes(payload)
              val req = DispatchRequest(payload,
                Map("kafka-offset" -> s"$t-$i", "kafka-topic" -> topic))
              val res = d.dispatch(req)
              if (res.statusCode != digest(req))
                errs.add(s"thread $t iter $i: got someone else's response")
              if (!res.action.contains(s"len=${payload.length}"))
                errs.add(s"thread $t iter $i: action mismatch ${res.action}")
            }
          })
          th.start(); th
        }
        ts.foreach(_.join(120000))
        assert(errs.isEmpty, errs.toArray.take(5).mkString("; "))
        // multiplexing is real: 4000 dispatches crossed exactly the
        // dispatcher's `connections` sockets, not one per RPC or per thread
        assert(server.acceptedConnections.get() == 4,
          s"expected 4 connections for ${threads * perThread} dispatches, " +
            s"dialed ${server.acceptedConnections.get()}")
      } finally d.close()
    } finally server.close()
  }

  test("a deadline poisons its connection's in-flight siblings but the dispatcher recovers") {
    val stallMarker = "stall".getBytes("UTF-8")
    val server = new SocketConsumerServer(req => {
      if (java.util.Arrays.equals(req.payload, stallMarker)) Thread.sleep(800)
      DispatchResult(digest(req), None, overdue = false)
    })
    try {
      // ONE connection so the poisoning contract is deterministic: the
      // stalled head request times out, and any frame pipelined behind it
      // becomes unmatchable -> UNAVAILABLE
      val d = new PipelinedSocketDispatcher("127.0.0.1", server.port,
        rpcTimeoutMs = 300, connections = 1)
      try {
        val head = new java.util.concurrent.CompletableFuture[DispatchResult]()
        val behind = new java.util.concurrent.CompletableFuture[DispatchResult]()
        val t1 = new Thread(() =>
          head.complete(d.dispatch(DispatchRequest(stallMarker, Map.empty))))
        t1.start()
        Thread.sleep(100) // the stalled frame is in flight on the connection
        val t2 = new Thread(() =>
          behind.complete(d.dispatch(DispatchRequest("x".getBytes, Map.empty))))
        t2.start()
        t1.join(10000); t2.join(10000)
        // the stalled head hit its wire deadline
        assert(head.get().statusCode == GrpcStatus.DEADLINE_EXCEEDED && head.get().overdue,
          head.get().toString)
        // the sibling was pipelined behind the stalled head: its response
        // can no longer be matched once the connection is poisoned
        assert(behind.get().statusCode == GrpcStatus.UNAVAILABLE, behind.get())
        // recovery: the next dispatch dials a fresh connection and succeeds
        val again = DispatchRequest("after".getBytes, Map("k" -> "v"))
        assert(d.dispatch(again).statusCode == digest(again))
      } finally d.close()
    } finally server.close()
  }

  test("an out-of-order server trips the seq check and poisons the connection") {
    // A raw-frame server that breaks the FIFO contract on purpose: it
    // reads TWO complete requests off one connection, then replies to them
    // in REVERSE order (each response echoing its own request's seq, as a
    // concurrent-handling server would). Before the explicit sequence id,
    // the dispatcher would have silently handed response 2 to caller 1 —
    // wrong verdicts with no error. Now the reader sees seq 1 where it
    // expects 0, poisons the connection, and BOTH callers get UNAVAILABLE.
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        sock.setTcpNoDelay(true)
        val in = new java.io.DataInputStream(sock.getInputStream)
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        def readReq(): Long = {
          val seq = in.readLong()
          val nh = in.readInt()
          (1 to nh).foreach { _ => in.readUTF(); in.readUTF() }
          val p = new Array[Byte](in.readInt()); in.readFully(p)
          seq
        }
        val s1 = readReq()
        val s2 = readReq()
        Seq(s2, s1).foreach { s => // reversed: the correlation violation
          out.writeLong(s); out.writeUTF(GrpcStatus.OK); out.writeUTF("")
        }
        out.flush()
      } catch { case _: java.io.IOException => () }
    })
    t.setDaemon(true); t.start()
    val d = new PipelinedSocketDispatcher("127.0.0.1", server.getLocalPort,
      rpcTimeoutMs = 5000, connections = 1)
    try {
      val r1 = new java.util.concurrent.CompletableFuture[DispatchResult]()
      val r2 = new java.util.concurrent.CompletableFuture[DispatchResult]()
      val t1 = new Thread(() => r1.complete(d.dispatch(DispatchRequest("a".getBytes, Map.empty))))
      t1.start()
      Thread.sleep(100) // request 1's frame is on the wire first
      val t2 = new Thread(() => r2.complete(d.dispatch(DispatchRequest("b".getBytes, Map.empty))))
      t2.start()
      t1.join(15000); t2.join(15000)
      // neither caller may see OK: the violation is surfaced, not absorbed
      assert(r1.get().statusCode == GrpcStatus.UNAVAILABLE, r1.get())
      assert(r2.get().statusCode == GrpcStatus.UNAVAILABLE, r2.get())
    } finally { d.close(); server.close() }
  }

  test("sync dispatcher rejects a mismatched seq echo as UNAVAILABLE") {
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val in = new java.io.DataInputStream(sock.getInputStream)
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        in.readLong() // the request's seq (0) — echo a WRONG one
        val nh = in.readInt()
        (1 to nh).foreach { _ => in.readUTF(); in.readUTF() }
        val p = new Array[Byte](in.readInt()); in.readFully(p)
        out.writeLong(99L); out.writeUTF(GrpcStatus.OK); out.writeUTF("")
        out.flush()
      } catch { case _: java.io.IOException => () }
    })
    t.setDaemon(true); t.start()
    val d = new SocketDispatcher("127.0.0.1", server.getLocalPort, rpcTimeoutMs = 3000)
    try {
      val res = d.dispatch(DispatchRequest("x".getBytes, Map.empty))
      assert(res.statusCode == GrpcStatus.UNAVAILABLE, res)
    } finally { d.close(); server.close() }
  }

  test("refused connection maps to UNAVAILABLE, not a hang") {
    val probe = new java.net.ServerSocket(0)
    val deadPort = probe.getLocalPort
    probe.close()
    val d = new PipelinedSocketDispatcher("127.0.0.1", deadPort, rpcTimeoutMs = 1000)
    try {
      val res = d.dispatch(DispatchRequest("x".getBytes, Map.empty))
      assert(res.statusCode == GrpcStatus.UNAVAILABLE)
      assert(!res.overdue) // refused instantly, well inside the deadline
    } finally d.close()
  }

  test("engine E2E: pipelined and sync dispatchers route every record identically") {
    // offset-keyed verdicts exercise all 8 codes through both wire forms
    val server = new SocketConsumerServer(req => {
      val off = req.headers("kafka-offset").toLong
      DispatchResult(GrpcStatus.all((off % GrpcStatus.all.size).toInt), None, overdue = false)
    })
    try {
      val n = 400
      def recs(): Dataset[KafkaRecord] =
        spark.createDataset((0 until n).map(i =>
          KafkaRecord(s"k$i".getBytes("UTF-8"), s"m$i".getBytes("UTF-8"), topic,
            i % 4, i.toLong, 1700000000000000000L + i, Map.empty)))
      def routedTable(f: DispatcherFactory): Seq[(String, Int, Long, String, String)] =
        ForwardingEngine.processBatch(spec1, f, "local-cluster", recs()).collect()
          .map(o => (o.physicalTopic, o.physicalPartition, o.physicalOffset, o.code, o.destination))
          .sortBy(t => (t._1, t._2, t._3)).toSeq
      val viaPipe = routedTable(
        PipelinedSocketDispatcherFactory("127.0.0.1", server.port, rpcTimeoutMs = 5000))
      val viaSync = routedTable(
        SocketDispatcherFactory("127.0.0.1", server.port, rpcTimeoutMs = 5000))
      assert(viaPipe.size == n && viaPipe == viaSync)
    } finally server.close()
  }
}
