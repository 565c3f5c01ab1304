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
      .flatMapGroupsWithState[AckTrackingQueue.Snapshot, WatermarkUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(process(capacity))
  }

  private def process(capacity: Int)(
      key: (String, Int),
      events: Iterator[AckStateOp.AckEvent],
      state: GroupState[AckTrackingQueue.Snapshot]): Iterator[WatermarkUpdate] = {
    val q = state.getOption
      .map(AckTrackingQueueRestore.restore)
      .getOrElse(new AckTrackingQueue(capacity))
    val out = scala.collection.mutable.ArrayBuffer.empty[WatermarkUpdate]
    // state-op contract: events within a group arrive unordered across the
    // batch; the queue itself tolerates unordered acks, receives must be
    // replayed in offset order for the in-order-receive invariant
    val (receives, others) = events.toSeq.partition(_.kind == "receive")
    receives.sortBy(_.offset).foreach(e => q.receive(e.offset))
    var lastCommitted = q.highestCommittedOffset
    others.sortBy(_.offset).foreach { e =>
      e.kind match {
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
    state.update(q.snapshot)
    out.iterator
  }
}
