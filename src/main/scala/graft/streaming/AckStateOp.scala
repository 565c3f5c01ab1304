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

  private def process(capacity: Int)(
      key: (String, Int),
      events: Iterator[AckStateOp.AckEvent],
      state: GroupState[AckStateOp.OpState]): Iterator[WatermarkUpdate] = {
    val prior = state.getOption
    val q = prior.map(s => AckTrackingQueueRestore.restore(s.queue))
      .getOrElse(new AckTrackingQueue(capacity))
    val out = scala.collection.mutable.ArrayBuffer.empty[WatermarkUpdate]
    val deferred = scala.collection.mutable.ArrayBuffer.empty[AckEvent]
    val deferredMsgs = scala.collection.mutable.Set.empty[Long]
    // state-op contract: events within a group arrive unordered across the
    // batch; the queue itself tolerates unordered acks, receives must be
    // replayed in offset order for the in-order-receive invariant.
    // Deferred events from prior triggers replay ahead of this batch's.
    val incoming = prior.map(_.pending).getOrElse(Seq.empty) ++ events
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
    state.update(OpState(q.snapshot, deferred.toSeq))
    out.iterator
  }
}
