package graft.streaming

import java.io.{DataInputStream, DataOutputStream, IOException}
import java.net.{InetSocketAddress, ServerSocket, Socket, SocketTimeoutException}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

/**
 * A [[Dispatcher]] that performs every dispatch over a REAL TCP connection
 * with per-message deadline semantics — the wire-facing counterpart of the
 * in-process test dispatchers, so `rpc_timeout_ms`, the overdue→BACKOFF
 * mapping, and connection failure→UNAVAILABLE are exercised against actual
 * socket I/O rather than modeled.
 *
 * Mirrors the reference's gRPC dispatcher behavior
 * (uforwarder/.../dispatcher/grpc/GrpcDispatcher.java:126-199): each message
 * gets a deadline of `rpcTimeoutMs` from dispatch start; a response that
 * does not arrive inside it maps to DEADLINE_EXCEEDED with `overdue=true`
 * (→ BACKOFF in Codes.codeFor), and a connect/write failure maps to
 * UNAVAILABLE with overdue reflecting whether the deadline had passed
 * (→ BACKOFF iff overdue, else INVALID's in-memory retry).
 *
 * Connections are pooled and reused across dispatches
 * (GrpcManagedChannelPool.java:57's role): the engine's dispatch pool calls
 * `dispatch` from many threads concurrently, so idle sockets sit in a
 * concurrent queue — borrow or connect, return on success, discard on any
 * error (a timed-out connection has an unread response in flight and can
 * never be reused).
 *
 * Wire protocol (length-prefixed frames over a persistent connection — a
 * stand-in for HTTP/2 framing; the sandbox has no gRPC jars):
 *   request:  headerCount:int, then per header UTF key + UTF value,
 *             payloadLen:int, payload bytes
 *   response: UTF status (gRPC status name), UTF action ("" = none)
 */
final class SocketDispatcher(host: String, port: Int, rpcTimeoutMs: Long)
    extends Dispatcher {

  private val idle = new ConcurrentLinkedQueue[Socket]()
  private val closed = new AtomicBoolean(false)

  private def connect(deadlineNs: Long): Socket = {
    val s = new Socket()
    val remainMs = math.max(1L, (deadlineNs - System.nanoTime()) / 1000000L)
    s.connect(new InetSocketAddress(host, port), remainMs.toInt)
    s.setTcpNoDelay(true)
    s
  }

  def dispatch(req: DispatchRequest): DispatchResult = {
    val deadlineNs = System.nanoTime() + rpcTimeoutMs * 1000000L
    def overdueNow = System.nanoTime() >= deadlineNs
    var sock: Socket = null
    try {
      sock = Option(idle.poll()).getOrElse(connect(deadlineNs))
      val out = new DataOutputStream(sock.getOutputStream)
      out.writeInt(req.headers.size)
      req.headers.foreach { case (k, v) => out.writeUTF(k); out.writeUTF(v) }
      out.writeInt(req.payload.length)
      out.write(req.payload)
      out.flush()
      // the read deadline is the REMAINING per-message budget, not a fixed
      // socket default — time spent connecting/writing counts against it
      val remainMs = math.max(1L, (deadlineNs - System.nanoTime()) / 1000000L)
      sock.setSoTimeout(remainMs.toInt)
      val in = new DataInputStream(sock.getInputStream)
      val status = in.readUTF()
      val action = in.readUTF()
      if (closed.get() || !idle.offer(sock)) sock.close() else sock = null
      DispatchResult(status, Option(action).filter(_.nonEmpty), overdueNow)
    } catch {
      case _: SocketTimeoutException =>
        // response still in flight on this connection — never reuse it
        DispatchResult(graft.model.GrpcStatus.DEADLINE_EXCEEDED, None, overdue = true)
      case _: IOException =>
        DispatchResult(graft.model.GrpcStatus.UNAVAILABLE, None, overdue = overdueNow)
    } finally {
      // non-null here ⇔ not returned to the pool (error path, or pool
      // refused): discard — a connection with an in-flight response must
      // never serve another request
      if (sock != null)
        try sock.close() catch { case _: IOException => () }
    }
  }

  override def close(): Unit = {
    closed.set(true)
    var s = idle.poll()
    while (s != null) {
      try s.close() catch { case _: IOException => () }
      s = idle.poll()
    }
  }
}

/** Serializable factory: each executor task builds its own dispatcher with
  * its own connection pool (one pool per pipeline task, like the
  * per-pipeline channel pool in the reference). */
final case class SocketDispatcherFactory(host: String, port: Int, rpcTimeoutMs: Long)
    extends DispatcherFactory {
  def create(): Dispatcher = new SocketDispatcher(host, port, rpcTimeoutMs)
}

/**
 * Minimal framed-protocol consumer service for tests/benches: the remote
 * end of [[SocketDispatcher]]. One daemon accept thread, one daemon thread
 * per connection; `handler` decides the verdict per request and may sleep
 * to simulate a stalled consumer (the client's deadline — not this server —
 * then decides the outcome, exactly the property under test).
 */
final class SocketConsumerServer(handler: DispatchRequest => DispatchResult) {
  // ephemeral port; deep accept backlog — a 32-task × 32-thread dispatch
  // burst dials ~1k connections at once and the default backlog of 50
  // would refuse the overflow
  private val server = new ServerSocket(0, 4096)
  def port: Int = server.getLocalPort
  private val running = new AtomicBoolean(true)
  /** Total connections ever accepted — lets tests prove the client pool
    * REUSES connections (accepted ≪ dispatches) instead of dialing per RPC. */
  val acceptedConnections = new java.util.concurrent.atomic.AtomicInteger(0)

  private def serve(sock: Socket): Unit = {
    try {
      // without NODELAY on the server side too, Nagle + delayed-ACK turns
      // every small response frame into a ~40 ms stall and the whole leg
      // serializes to ~25 RPC/s per connection
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      while (running.get()) {
        val nHeaders = in.readInt()
        val headers = (1 to nHeaders).map(_ => in.readUTF() -> in.readUTF()).toMap
        val payload = new Array[Byte](in.readInt())
        in.readFully(payload)
        val res = handler(DispatchRequest(payload, headers))
        out.writeUTF(res.statusCode)
        out.writeUTF(res.action.getOrElse(""))
        out.flush()
      }
    } catch { case _: IOException => () } // client hung up / timed out
    finally { try sock.close() catch { case _: IOException => () } }
  }

  private val acceptor = new Thread(() => {
    try while (running.get()) {
      val sock = server.accept()
      acceptedConnections.incrementAndGet()
      val t = new Thread(() => serve(sock), s"graft-sock-serve-${sock.getPort}")
      t.setDaemon(true)
      t.start()
    } catch { case _: IOException => () } // closed
  }, "graft-sock-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = {
    running.set(false)
    try server.close() catch { case _: IOException => () }
  }
}
