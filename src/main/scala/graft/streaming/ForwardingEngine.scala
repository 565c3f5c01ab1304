package graft.streaming

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * The forwarding data path: Kafka-shaped records in → per-message dispatch
 * over a pluggable RPC boundary → ack / tiered-retry / DLQ routing →
 * queue-topic produce + commit watermark out.
 *
 * Architecture (Spark-first re-expression of the reference's
 * fetcher→processor→dispatcher pipeline, SURVEY.md §3.2):
 *
 *  - source: `spark.readStream.format("kafka")` (or any DataFrame with the
 *    Kafka schema — tests use MemoryStream); flow control via
 *    `maxOffsetsPerTrigger` from `JobSpec.flowControl`.
 *  - unwrap + filter: columnar (`ProcessorMessage.of` equivalent) — decode
 *    the DLQMetadata key envelope on wrapped topics, drop replication loops
 *    by `original_cluster` header.
 *  - dispatch: executor-side `mapPartitions` — per-task async dispatch pool
 *    with Vegas-adaptive concurrency and the real AckTrackingQueue
 *    computing the contiguous commit watermark out-of-order-safely.
 *  - route: pure model functions (code → escalation → destination).
 *  - produce: one Kafka batch write with the per-row `topic` column
 *    (Kafka sink routes natively); tests plug an in-memory topic store.
 *
 * At scale: records of one topic-partition arrive in one source partition
 * (Kafka source guarantee), so the ack queue per (topic,partition) slice is
 * executor-local state — no shuffle in the hot path at all; the only
 * cross-task data movement is the produced retry/DLQ records, written
 * directly from the same task.
 */
object ForwardingEngine {

  /** Kafka-source-shaped record (includeHeaders=true layout). */
  final case class KafkaRecord(
      key: Array[Byte],
      value: Array[Byte],
      topic: String,
      partition: Int,
      offset: Long,
      timestampNs: Long,
      headers: Map[String, Array[Byte]])

  /** The unwrapped processor message: physical + logical identity + counters
    * (reference: uforwarder/.../processor/ProcessorMessage.java:34-127). */
  final case class ProcessorMessage(
      key: Array[Byte],
      value: Array[Byte],
      physicalTopic: String,
      physicalPartition: Int,
      physicalOffset: Long,
      physicalTimestampNs: Long,
      logicalTopic: String,
      logicalPartition: Int,
      logicalOffset: Long,
      logicalTimestampNs: Long,
      retryCount: Long,
      timeoutCount: Long,
      producerCluster: String)

  /** Terminal outcome of one message within a batch. */
  final case class Outcome(
      physicalTopic: String,
      physicalPartition: Int,
      physicalOffset: Long,
      code: String,
      destination: String, // "" = acked in place
      outKey: Array[Byte],
      outValue: Array[Byte],
      retryCount: Long,
      timeoutCount: Long,
      commitWatermark: Long) // per-partition watermark as of this task, -1 if unknown

  /** Unwrap a raw record into a ProcessorMessage
    * (reference: ProcessorMessage.of, ProcessorMessage.java:173-228). */
  def unwrap(spec: JobSpec, r: KafkaRecord): ProcessorMessage = {
    val cluster = r.headers.get("original_cluster")
      .map(b => new String(b, "UTF-8")).getOrElse("")
    if (spec.isWrappedTopic(r.topic)) {
      DlqMetadata.decode(r.key) match {
        case Some(m) =>
          ProcessorMessage(m.data, r.value, r.topic, r.partition, r.offset,
            r.timestampNs, m.topic, m.partition, m.offset, m.timestampNs,
            m.retryCount, m.timeoutCount, cluster)
        case None => // malformed key: treat as plain (defensive)
          ProcessorMessage(r.key, r.value, r.topic, r.partition, r.offset,
            r.timestampNs, r.topic, r.partition, r.offset, r.timestampNs,
            0L, 0L, cluster)
      }
    } else {
      ProcessorMessage(r.key, r.value, r.topic, r.partition, r.offset,
        r.timestampNs, r.topic, r.partition, r.offset, r.timestampNs,
        0L, 0L, cluster)
    }
  }

  /** Adapt a Kafka-schema source DataFrame (the `format("kafka")` /
    * `format("graft-queue")` includeHeaders=true layout) into the engine's
    * typed record stream. One adapter serves both sources — the engine
    * never knows which connector produced the frame. */
  def fromSourceFrame(df: DataFrame): Dataset[KafkaRecord] = {
    import df.sparkSession.implicits._
    // Kafka's wire format allows REPEATED header keys (routine for tracing
    // headers); a plain map_from_entries would throw on the first duplicate
    // and kill the query. Fold with filter-then-concat instead: last
    // occurrence wins, matching Headers.lastHeader semantics. O(n²) in the
    // header count, which is single digits per record.
    val dedupedHeaders = expr(
      """aggregate(headers, CAST(map() AS MAP<STRING, BINARY>),
        |  (acc, h) -> map_concat(map_filter(acc, (k, v) -> k != h.key), map(h.key, h.value)))""".stripMargin)
    df.select(
        col("key"), col("value"), col("topic"), col("partition"), col("offset"),
        (unix_micros(col("timestamp")) * 1000L).as("timestampNs"),
        when(col("headers").isNotNull, dedupedHeaders)
          .otherwise(typedLit(Map.empty[String, Array[Byte]])).as("headers"))
      .as[KafkaRecord]
  }

  /** Anti-replication-loop guard
    * (reference: OriginalClusterFilter.java:8-27). */
  def clusterFilter(localCluster: String)(m: ProcessorMessage): Boolean =
    m.producerCluster.isEmpty || m.producerCluster.equalsIgnoreCase(localCluster)

  /** Wrap a message for produce to a retry/DLQ/resq topic: the key becomes
    * the DLQMetadata envelope carrying logical identity + the (already
    * incremented) redelivery counters
    * (reference: ProcessorMessage.getKafkaDispatcherMessage:311-341). */
  def wrapForProduce(m: ProcessorMessage, newRetryCount: Long, newTimeoutCount: Long): (Array[Byte], Array[Byte]) = {
    val meta = DlqMetadata(
      retryCount = newRetryCount,
      topic = m.logicalTopic,
      partition = m.logicalPartition,
      offset = m.logicalOffset,
      timestampNs = m.logicalTimestampNs,
      data = if (m.key == null) Array.emptyByteArray else m.key,
      timeoutCount = newTimeoutCount)
    (DlqMetadata.encode(meta), m.value)
  }

  /** The kafka-* metadata headers sent with each RPC
    * (reference: GrpcRequest.java:15-23, ConsumerMetadata.java:17-22). */
  def rpcHeaders(spec: JobSpec, m: ProcessorMessage, attempt: Long): Map[String, String] = Map(
    "kafka-topic" -> m.logicalTopic,
    "kafka-consumergroup" -> spec.consumerGroup,
    "kafka-partition" -> m.logicalPartition.toString,
    "kafka-offset" -> m.logicalOffset.toString,
    "kafka-retrycount" -> m.retryCount.toString,
    "kafka-attemptcount" -> attempt.toString)

  /**
   * Process one partition-slice of records: dispatch each through the
   * Dispatcher with ack tracking, then compute routing outcomes.
   *
   * Runs on executors. Records in a slice belong to contiguous offsets of
   * few (topic,partition)s; an AckTrackingQueue per (topic,partition)
   * computes the commit watermark exactly as the reference does.
   */
  def processSlice(
      spec: JobSpec,
      dispatcherFactory: DispatcherFactory,
      localCluster: String,
      ackCapacity: Int = 10000,
      holDetector: HeadBlockingDetector = HeadBlockingDetector())(
      records: Iterator[KafkaRecord]): Iterator[Outcome] = {
    import java.util.concurrent.{CompletableFuture, Executors, TimeUnit}

    val dispatcher = dispatcherFactory.create(spec.security)
    val poolSize = {
      val mi = spec.flowControl.maxInflightMessages
      if (mi >= Double.MaxValue) 32 else math.max(1, math.min(mi.toInt, 64))
    }
    val pool = Executors.newFixedThreadPool(poolSize)
    val vegas = new VegasLimiter(initialLimit = math.min(100, poolSize * 4),
      maxLimit = poolSize * 8)
    val latency = new LatencyTracker()
    val lock = new Object // guards queues/tokens/results across completions
    val queues = scala.collection.mutable.Map.empty[(String, Int), AckTrackingQueue]
    val tokens = scala.collection.mutable.Map.empty[(String, Int), TokenBucket]
    val results = scala.collection.mutable.ArrayBuffer.empty[Outcome]
    val inflightCfs = scala.collection.mutable.Map.empty[(String, Int, Long), CompletableFuture[DispatchCode]]
    val pending = scala.collection.mutable.ArrayBuffer.empty[CompletableFuture[Void]]

    /** terminal handling for one completed (or canceled) dispatch — runs on
      * whichever thread completes the future first (out-of-order acks). */
    def complete(idx: Int, r: KafkaRecord, m: ProcessorMessage, mapped: DispatchCode): Unit =
      lock.synchronized {
        val q = queues((r.topic, r.partition))
        val tb = tokens((r.topic, r.partition))
        val (code: DispatchCode, finalTimeout: Long) = mapped match {
          case DispatchCode.Commit | DispatchCode.Skip =>
            tb.credit(1) // successes credit the DLQ token bucket
            (mapped, m.timeoutCount)
          case DispatchCode.Backoff =>
            val esc = Routing.escalateBackoff(spec, r.topic, m.timeoutCount,
              tb.tryAcquire(1))
            (esc, m.timeoutCount + 1) // handleTimeout increments the counter
          case other => (other, m.timeoutCount)
        }
        val newRetryCount = m.retryCount + 1 // incremented before every produce
        // resq-origin timeout escalates to INVALID = "retry in memory"
        // (reference: handleTimeout), but the dispatch loop has already
        // finished by completion time — re-produce to the resq topic so the
        // message is redelivered rather than silently acked away
        val dest =
          if (code == DispatchCode.Invalid && spec.isResqTopic(r.topic)) spec.resqTopic
          else Routing.destinationTopic(spec, code, newRetryCount).getOrElse("")
        val (outKey, outValue) =
          if (dest.nonEmpty) wrapForProduce(m, newRetryCount, finalTimeout)
          else (null, null)
        // at-least-once: if the downstream produce fails the batch retries
        // wholesale; within the batch, nack precedes the queue produce
        if (dest.nonEmpty) q.nack(r.offset + 1)
        val wm = q.ack(r.offset + 1)
        val watermark = if (wm >= 0) wm else q.highestCommittedOffset
        while (results.size <= idx) results += null
        results(idx) = Outcome(r.topic, r.partition, r.offset, code.name, dest,
          outKey, outValue, m.retryCount, finalTimeout, watermark)
        inflightCfs.remove((r.topic, r.partition, r.offset))
        lock.notifyAll() // wake the producer waiting on capacity/permits
      }

    var idx = 0
    try {
      records.foreach { r =>
      val key = (r.topic, r.partition)
      val q = lock.synchronized(queues.getOrElseUpdate(key, new AckTrackingQueue(ackCapacity)))
      lock.synchronized(tokens.getOrElseUpdate(key, new TokenBucket(1000)))
      val m = unwrap(spec, r)

      // admission backpressure: wait for ack-queue capacity AND a Vegas
      // permit. Completions notify; if the head of line blocks a nearly-
      // all-acked queue, cancel it (poison pill -> retry route) exactly like
      // HeadBlockingDetector + MessageStub.cancel
      // (reference: BlockingQueueStubManager.java:43-376)
      lock.synchronized {
        val waitStart = System.nanoTime()
        var lastDetect = 0L
        while (q.isFull || !vegas.tryAcquire()) {
          // throttle the O(capacity) head-of-line scan to ~10/s: it runs
          // under the completion lock, and scanning every 1ms wake-up would
          // starve the very completions that free capacity
          val nowNs = System.nanoTime()
          if (q.isFull && nowNs - lastDetect > 100000000L) {
            lastDetect = nowNs
            holDetector.detect(q).foreach { headOffset =>
              if (q.cancel(headOffset + 1)) {
                inflightCfs.get((r.topic, r.partition, headOffset))
                  .foreach(_.complete(DispatchCode.Retry)) // resolve pending RPC now
              }
            }
          }
          lock.wait(1)
          // elapsed WALL time, not wake-up count: frequent notifyAll would
          // otherwise trip this long before 60 real seconds
          require(System.nanoTime() - waitStart < 60000000000L,
            "ack queue wedged: no completions for 60s")
        }
        q.receive(r.offset)
      }
      val myIdx = idx
      idx += 1

      if (!clusterFilter(localCluster)(m)) {
        vegas.release(0L, dropped = false)
        complete(myIdx, r, m, DispatchCode.Dropped) // dropped = acked immediately
      } else {
        val cf = new CompletableFuture[DispatchCode]()
        lock.synchronized(inflightCfs.put((r.topic, r.partition, r.offset), cf))
        val t0 = System.nanoTime()
        pool.execute(() => {
          // in-memory retry of INVALID outcomes (mirrors the Failsafe gRPC
          // retry policy, ProcessorImpl.java:645-706; bounded attempts
          // instead of wall-clock backoff to keep batches finite)
          try {
            var attempt = 0L
            var mapped: DispatchCode = DispatchCode.Invalid
            var continueRetry = true
            while (continueRetry && !cf.isDone) {
              val res = dispatcher.dispatch(DispatchRequest(m.value, rpcHeaders(spec, m, attempt)))
              mapped = Responses.codeFor(res.statusCode, res.overdue, res.action)
              attempt += 1
              continueRetry = mapped == DispatchCode.Invalid && attempt < 3
            }
            cf.complete(mapped)
            ()
          } catch { case e: Throwable => cf.complete(DispatchCode.Invalid); () }
        })
        // the barrier must await the *handler*, not just the dispatch result
        pending += cf.thenAccept { code =>
          val rtt = System.nanoTime() - t0
          latency.record(rtt)
          vegas.release(rtt, dropped = false)
          complete(myIdx, r, m, code)
        }
      }
      }
      CompletableFuture.allOf(pending.toSeq: _*).get(10, TimeUnit.MINUTES)
    }
    // the completion barrier runs inside the same try: on the success path
    // it awaits every handler; on any failure (wedge require, dispatch
    // explosion) the finally still tears down the pool and RPC channels —
    // a failed task previously leaked 64 non-daemon threads + one channel
    // pool per Spark retry on the same executor JVM
    finally {
      pool.shutdownNow()
      dispatcher.close()
    }
    // degraded-consumer health signal (reference: LatencyTracker median-vs-
    // timeout check feeding KafkaPipelineIssue)
    if (latency.isDegraded(spec.rpc.rpcTimeoutMs * 1000000L))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"[graft] ${spec.jobGroupId}: median dispatch latency " +
          s"${latency.stats.medianNanos / 1000000} ms exceeds rpc timeout ${spec.rpc.rpcTimeoutMs} ms")
    results.iterator.filter(_ != null)
  }

  /** Batch-process a Dataset of records (the foreachBatch body). */
  def processBatch(
      spec: JobSpec,
      dispatcherFactory: DispatcherFactory,
      localCluster: String,
      records: Dataset[KafkaRecord]): Dataset[Outcome] = {
    import records.sparkSession.implicits._
    // co-locate each topic-partition in one task so ack tracking is local;
    // the Kafka source already delivers this layout — the repartition is a
    // no-op there and only matters for arbitrary test sources.
    records
      .repartition(col("topic"), col("partition"))
      .sortWithinPartitions("topic", "partition", "offset")
      .mapPartitions(processSlice(spec, dispatcherFactory, localCluster))
  }

  /**
   * Visibility-delay gate for retry-tier consumption: a record fetched from
   * tier topic T may only be processed once
   * `now >= record_timestamp + T.processingDelayMs`; younger records are
   * filtered out of this trigger and picked up by a later one (the
   * trigger-cadence equivalent of the reference's partition pause/resume —
   * reference: KafkaDelayProcessManager.shouldDelayProcess:53-61).
   * Non-tier topics pass through untouched — including records whose
   * timestamps sit ahead of `nowMs` from producer clock skew.
   *
   * Apply PER MICRO-BATCH (inside foreachBatch, with the trigger's wall
   * time): `nowMs` is a plan-time constant, so composing this over a
   * streaming Dataset once before `writeStream` would freeze "now" at
   * stream start and hold tier records back forever.
   */
  def delayGate(records: Dataset[KafkaRecord], spec: JobSpec, nowMs: Long): Dataset[KafkaRecord] = {
    val tiers = spec.sortedTiers
    if (tiers.isEmpty) return records
    val delayByTopic = tiers.map(t => t.topic -> t.processingDelayMs).toMap
    val isTier = delayByTopic.keys
      .map(t => col("topic") === t)
      .reduce(_ || _)
    val delayCol = delayByTopic.foldLeft(lit(0L)) { case (acc, (t, d)) =>
      when(col("topic") === t, lit(d)).otherwise(acc)
    }
    records.filter(!isTier || expr("timestampNs DIV 1000000") + delayCol <= nowMs)
  }

  /**
   * Streaming throughput tracker: per-topic msgs/sec + bytes/sec over
   * 1-minute event-time windows (the ThroughputTracker analog; reference:
   * uforwarder-core/.../fetchers/kafka/ThroughputTracker.java:11,50-75).
   * Watermarked windowed aggregation — partial aggregation happens map-side,
   * state is bounded by the watermark horizon.
   */
  def throughput(records: Dataset[KafkaRecord]): org.apache.spark.sql.DataFrame =
    records
      .withColumn("ts", timestamp_micros(expr("timestampNs DIV 1000")))
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute"), col("topic"))
      .agg(
        count(lit(1)).as("n"),
        sum(octet_length(col("value"))).cast("long").as("bytes"))
      .withColumn("msgs_per_sec", col("n") / 60.0)
      .withColumn("bytes_per_sec", col("bytes") / 60.0)

  /**
   * Start the streaming pipeline: source stream → processBatch → produce
   * routed records to the queue store + expose outcomes.
   */
  def run(
      spec: JobSpec,
      dispatcherFactory: DispatcherFactory,
      localCluster: String,
      stream: Dataset[KafkaRecord],
      store: QueueStore,
      checkpointDir: String,
      queryName: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      committer: Option[OffsetCommitter] = None): StreamingQuery = {
    // default trigger: continuous micro-batches — a long-running forwarding
    // job keeps consuming as data arrives (AvailableNow would snapshot the
    // offsets at start and self-terminate, which only fits drain jobs)
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[KafkaRecord], batchId: Long) =>
        if (committer.isEmpty) {
          store.produce(processBatch(spec, dispatcherFactory, localCluster, batch))
        } else {
          // two actions over the outcomes (queue produce + watermark pull):
          // persist so the dispatch pass — which talks to the consumer
          // service — normally runs once per batch. Cache eviction or
          // partition loss can recompute it, re-dispatching that slice:
          // at-least-once, the same contract the dispatch path already
          // accepts (task retries duplicate too)
          val outcomes = processBatch(spec, dispatcherFactory, localCluster, batch).persist()
          try {
            store.produce(outcomes)
            // commit the ACK watermark per (topic,partition) — the
            // reference's semantic (commit the acked prefix, not the fetch
            // position) — through the cadence/keepalive policy
            val wms = outcomes.filter(col("commitWatermark") >= 0L)
              .groupBy(col("physicalTopic"), col("physicalPartition"))
              .agg(max(col("commitWatermark")).as("wm"))
              .collect()
              .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
            committer.foreach { c => c.offer(wms); c.tick() }
          } finally { outcomes.unpersist(); () }
        }
        ()
      }
      .start()
  }
}

/** One RPC to the consumer service (the gRPC boundary). */
final case class DispatchRequest(payload: Array[Byte], headers: Map[String, String])

/** Consumer's verdict: gRPC status name + optional kafka-action trailer +
  * whether the deadline had passed (overdue). */
final case class DispatchResult(statusCode: String, action: Option[String], overdue: Boolean)

trait Dispatcher extends java.io.Closeable {
  def dispatch(req: DispatchRequest): DispatchResult
  override def close(): Unit = ()
}

/** Serializable factory — one Dispatcher per executor task (mirrors the
  * per-pipeline gRPC channel pool). Security-aware factories override the
  * two-arg form to build TLS channels / verify service identities from the
  * job's SecurityConfig (reference: job.proto:370-379; the fetcher side
  * keys channel pools by (cluster, isSecure) — ClusterAndIsSecureKey.java). */
trait DispatcherFactory extends Serializable {
  def create(): Dispatcher
  def create(security: graft.model.SecuritySpec): Dispatcher = create()
}

/** Where routed (retry/DLQ/resq) records go. In production this is the Kafka
  * batch write with the per-row `topic` column; tests use an in-memory map. */
trait QueueStore extends Serializable {
  def produce(outcomes: Dataset[ForwardingEngine.Outcome]): Unit
}
