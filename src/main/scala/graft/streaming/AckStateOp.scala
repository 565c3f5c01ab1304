package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Cross-batch ack-tracking as a first-class Structured Streaming state
 * operator: a stream of receive/ack/nack/cancel events keyed by
 * (topic, partition) folds through the AckTrackingQueue held in the Spark
 * state store, emitting a commit-watermark update whenever the contiguous
 * prefix advances.
 *
 * This is the `flatMapGroupsWithState` mapping of the reference's ack queue
 * (SURVEY.md §2.8): the engine's in-batch path (ForwardingEngine) keeps the
 * queue task-local because a micro-batch completes all its messages; this
 * operator is the cross-trigger form for deployments where acks arrive on a
 * separate stream (e.g. a consumer-ack topic) decoupled from delivery.
 *
 * State is the queue's serializable snapshot — bounded by the queue
 * capacity (max ack-commit skew, reference default 10,000), so state-store
 * size per partition is bounded regardless of stream length.
 */
object AckStateOp {

  /** One ack-protocol event. kind: receive | ack | nack | cancel.
    * ack/nack/cancel carry offset+1 per the Kafka commit convention. */
  final case class AckEvent(topic: String, partition: Int, offset: Long, kind: String)

  final case class WatermarkUpdate(
      topic: String,
      partition: Int,
      commitOffset: Long,
      inflight: Int,
      highestReceived: Long)

  /** State-store record: the queue snapshot plus events deferred by
    * capacity backpressure. A receive that arrives while the queue is full
    * must NOT be discarded (its ack would later be skipped and the
    * watermark would advance over an undelivered message); it carries to
    * the next trigger, along with any of its own follow-up events, until
    * acks purge capacity. */
  final case class OpState(
      queue: AckTrackingQueue.Snapshot,
      pending: Seq[AckEvent])

  /** Bridge from the engine's per-message outcomes to the ack-event
    * protocol: every outcome is a receive followed by an ack, because the
    * engine resolves every message within its batch — terminal codes ack in
    * place, routed codes (destination != "") are resolved by the produce of
    * their re-wrapped copy, and even INVALID is acked after its bounded
    * in-memory retries (ForwardingEngine.complete). The decoupled
    * deployment this operator exists for replaces the ack half with events
    * from the consumer's own ack stream; this bridge is the degenerate
    * same-batch form and must reproduce the engine's watermark exactly. */
  def fromOutcomes(outcomes: Dataset[ForwardingEngine.Outcome]): Dataset[AckEvent] = {
    val spark = outcomes.sparkSession
    import spark.implicits._
    outcomes.flatMap { o =>
      Seq(
        AckEvent(o.physicalTopic, o.physicalPartition, o.physicalOffset, "receive"),
        AckEvent(o.physicalTopic, o.physicalPartition, o.physicalOffset + 1, "ack"))
    }
  }

  def updates(
      events: Dataset[AckEvent],
      capacity: Int = 10000): Dataset[WatermarkUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.topic, e.partition))
      .flatMapGroupsWithState[OpState, WatermarkUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(process(capacity))
  }

  /** Shared event fold: replay deferred-then-incoming events into the
    * queue, appending watermark advances to `out`; returns the events
    * deferred by capacity backpressure. */
  private def fold(
      q: AckTrackingQueue,
      key: (String, Int),
      incoming: Seq[AckEvent],
      out: scala.collection.mutable.ArrayBuffer[WatermarkUpdate]): Seq[AckEvent] = {
    val deferred = scala.collection.mutable.ArrayBuffer.empty[AckEvent]
    val deferredMsgs = scala.collection.mutable.Set.empty[Long]
    // state-op contract: events within a group arrive unordered across the
    // batch; the queue itself tolerates unordered acks, receives must be
    // replayed in offset order for the in-order-receive invariant.
    val (receives, others) = incoming.partition(_.kind == "receive")
    receives.sortBy(_.offset).foreach { e =>
      // once one receive defers, every later one must too (in-order
      // invariant); receive()==false with spare capacity is a stale
      // duplicate and is dropped as before
      if (deferredMsgs.nonEmpty) { deferred += e; deferredMsgs += e.offset }
      else if (!q.receive(e.offset) && q.isFull) { deferred += e; deferredMsgs += e.offset }
    }
    var lastCommitted = q.highestCommittedOffset
    others.sortBy(_.offset).foreach { e =>
      // an ack/nack/cancel for a deferred message (events carry offset+1)
      // defers with it — applying it now would be silently ignored and the
      // message would stay unresolvable forever
      if (deferredMsgs.contains(e.offset - 1)) deferred += e
      else e.kind match {
        case "ack" =>
          val wm = q.ack(e.offset)
          if (wm >= 0 && wm != lastCommitted) {
            lastCommitted = wm
            out += WatermarkUpdate(key._1, key._2, wm, q.size, q.highestReceivedOffset)
          }
        case "nack" => q.nack(e.offset)
        case "cancel" => q.cancel(e.offset)
        case _ =>
      }
    }
    deferred.toSeq
  }

  private def process(capacity: Int)(
      key: (String, Int),
      events: Iterator[AckStateOp.AckEvent],
      state: GroupState[AckStateOp.OpState]): Iterator[WatermarkUpdate] = {
    val prior = state.getOption
    val q = prior.map(s => AckTrackingQueueRestore.restore(s.queue))
      .getOrElse(new AckTrackingQueue(capacity))
    val out = scala.collection.mutable.ArrayBuffer.empty[WatermarkUpdate]
    // deferred events from prior triggers replay ahead of this batch's
    val incoming = prior.map(_.pending).getOrElse(Seq.empty) ++ events
    val deferred = fold(q, key, incoming, out)
    state.update(OpState(q.snapshot, deferred))
    out.iterator
  }

  // ---- head-of-line mitigation (the detector ACTUATED in the live path) ----

  /** Output of [[signals]]: a watermark advance or a head-of-line diversion
    * order. kind = "watermark" | "divert". A divert carries the stuck
    * MESSAGE offset the caller must fetch, re-produce to its retry/DLQ
    * route, and then ack back through the event stream — the reference's
    * cancel → poison-pill diversion (BlockingQueueStubManager.java:43-376;
    * cancel→code mapping ProcessorImpl.java:750-757). */
  final case class AckSignal(
      kind: String,
      topic: String,
      partition: Int,
      commitOffset: Long,
      inflight: Int,
      highestReceived: Long,
      divertOffset: Long)

  /**
   * [[updates]] plus live head-of-line detection: after each trigger's
   * fold, the detector inspects the queue — if the (nearly) full queue is
   * mostly acked with an unacked head, the head is CANCELED in the queue
   * state and a divert signal is emitted. The canceled offset leaves the
   * cancelable set, so the detector won't re-order the same diversion on
   * the next trigger; the watermark advances once the caller's re-produce
   * confirm arrives as an ack event.
   */
  def signals(
      events: Dataset[AckEvent],
      capacity: Int = 10000,
      detector: HeadBlockingDetector = HeadBlockingDetector()): Dataset[AckSignal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.topic, e.partition))
      .flatMapGroupsWithState[OpState, AckSignal](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(processSignals(capacity, detector))
  }

  private def processSignals(capacity: Int, detector: HeadBlockingDetector)(
      key: (String, Int),
      events: Iterator[AckStateOp.AckEvent],
      state: GroupState[AckStateOp.OpState]): Iterator[AckSignal] = {
    val prior = state.getOption
    val q = prior.map(s => AckTrackingQueueRestore.restore(s.queue))
      .getOrElse(new AckTrackingQueue(capacity))
    val wmOut = scala.collection.mutable.ArrayBuffer.empty[WatermarkUpdate]
    val incoming = prior.map(_.pending).getOrElse(Seq.empty) ++ events
    val deferred = fold(q, key, incoming, wmOut)
    val out = scala.collection.mutable.ArrayBuffer.empty[AckSignal]
    wmOut.foreach(w => out += AckSignal(
      "watermark", w.topic, w.partition, w.commitOffset, w.inflight, w.highestReceived,
      AckTrackingQueue.InitialOffset))
    detector.detect(q).foreach { off =>
      if (q.cancel(off + 1))
        out += AckSignal("divert", key._1, key._2, AckTrackingQueue.InitialOffset,
          q.size, q.highestReceivedOffset, off)
    }
    state.update(OpState(q.snapshot, deferred))
    out.iterator
  }

  /**
   * Run the mitigation loop as a streaming query: fold the ack-event
   * stream, emit watermarks, and hand each signal to `onSignal` on the
   * driver (the per-trigger signal count is bounded by the partition count,
   * so the collect is control-plane-sized by construction). The caller's
   * divert handler fetches the stuck record, produces it to its retry/DLQ
   * route, and feeds the produce-confirm back as an ack event — after
   * which the next trigger's fold advances the watermark past the pill.
   */
  def runMitigation(
      events: Dataset[AckEvent],
      capacity: Int,
      detector: HeadBlockingDetector,
      checkpointDir: String,
      queryName: String)(onSignal: AckSignal => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    signals(events, capacity, detector)
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[AckSignal], _: Long) =>
        batch.collect()
          .sortBy(s => (s.topic, s.partition, s.kind, s.commitOffset, s.divertOffset))
          .foreach(onSignal)
        ()
      }
      .start()
}
