package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import AckStateOp.{AckEvent, WatermarkUpdate}

/**
 * The cross-batch ack tracker on the `transformWithState` arbitrary-state
 * API (Spark 4.x) — the scale-correct successor to [[AckStateOp]]'s
 * `flatMapGroupsWithState` form.
 *
 * Why it matters at scale: fMGWS round-trips ONE opaque state value per key
 * per trigger, so a 10,000-entry ack queue (the reference's max ack-commit
 * skew, application-uforwarder-worker.yaml:112) is fully deserialized,
 * mutated, and re-serialized even when a trigger touches three offsets.
 * This processor decomposes the queue into typed state primitives the
 * RocksDB state store updates incrementally:
 *
 *   - `scalars`  ValueState — the five watermark/bound scalars + count;
 *   - `nodes`    MapState[offset, (status, next)] — the reference's
 *     LinkedAckTrackingQueue (LinkedAckTrackingQueue.java:22-264)
 *     re-expressed as a singly-linked list IN the state store: receive
 *     appends a node (one map put + one tail-link update), ack flips one
 *     node, and the commit-watermark purge walks exactly the acked prefix,
 *     deleting as it goes;
 *   - `pending`  ListState — receives (and their follow-up events)
 *     deferred by capacity backpressure, replayed next trigger.
 *
 * Per-trigger state-store traffic is O(events + purged), independent of
 * queue depth. Semantics are bit-identical to [[AckStateOp]] — the spec
 * replays random event streams through both and asserts equal output.
 */
object AckStateTws {

  /** Watermark/bound scalars. head/tail delimit the in-flight linked list
    * (None = -1 when empty); count is the in-flight size (MapState has no
    * O(1) size). First-receive initialization mirrors
    * AckTrackingQueue.receive. */
  final case class Scalars(
      highestReceived: Long,
      highestAcked: Long,
      committed: Long,
      head: Long,
      tail: Long,
      count: Int)

  /** One linked-list node: AckStatus rank (AckTrackingQueue.AckStatus) and
    * the next in-flight offset (-1 = list tail). */
  final case class Node(status: Int, next: Long)

  private val Nil_ = -1L
  private val Unset = 0
  private val Nacked = 1
  private val Canceled = 2
  private val Acked = 3

  /** Same contract as [[AckStateOp.updates]]; requires the RocksDB state
    * store provider (a transformWithState requirement). */
  def updates(
      events: Dataset[AckEvent],
      capacity: Int = 10000): Dataset[WatermarkUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.topic, e.partition))
      .transformWithState(new Processor(capacity), TimeMode.None(), OutputMode.Append())
  }

  final class Processor(capacity: Int)
      extends StatefulProcessor[(String, Int), AckEvent, WatermarkUpdate] {

    @transient private var scalars: ValueState[Scalars] = _
    @transient private var nodes: MapState[Long, Node] = _
    @transient private var pending: ListState[AckEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      scalars = getHandle.getValueState[Scalars](
        "scalars", Encoders.product[Scalars], TTLConfig.NONE)
      nodes = getHandle.getMapState[Long, Node](
        "nodes", Encoders.scalaLong, Encoders.product[Node], TTLConfig.NONE)
      pending = getHandle.getListState[AckEvent](
        "pending", Encoders.product[AckEvent], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: (String, Int),
        rows: Iterator[AckEvent],
        timerValues: TimerValues): Iterator[WatermarkUpdate] = {
      var s =
        if (scalars.exists()) scalars.get()
        else Scalars(Nil_, Nil_, Nil_, Nil_, Nil_, 0)

      def validate(offset: Long): Boolean =
        offset > s.committed && offset <= s.highestReceived + 1

      // receive: append a node; one put + one tail-link update
      def receive(offset: Long): Boolean = {
        if (offset <= s.highestReceived) return false
        if (s.count >= capacity) return false
        if (s.highestReceived == Nil_)
          s = s.copy(committed = offset, highestAcked = offset)
        nodes.updateValue(offset, Node(Unset, Nil_))
        if (s.count == 0) s = s.copy(head = offset)
        else nodes.updateValue(s.tail, nodes.getValue(s.tail).copy(next = offset))
        s = s.copy(tail = offset, highestReceived = offset, count = s.count + 1)
        true
      }

      // ack: flip one node; purge walk touches exactly the acked prefix
      def ack(offset: Long): Long = {
        if (!validate(offset)) return AckTrackingQueue.CannotAck
        val k = offset - 1
        if (!nodes.containsKey(k)) return AckTrackingQueue.CannotAck
        val node = nodes.getValue(k)
        if (node.status == Acked) return AckTrackingQueue.DuplicatedAck
        nodes.updateValue(k, node.copy(status = Acked))
        if (s.highestAcked < offset) s = s.copy(highestAcked = offset)
        if (nodes.getValue(s.head).status != Acked) return AckTrackingQueue.InMemoryAckOnly
        var committed = s.committed
        var cur = s.head
        var walking = true
        while (walking && cur != Nil_) {
          val n = nodes.getValue(cur)
          if (n.status == Acked) {
            committed = cur + 1
            nodes.removeKey(cur)
            s = s.copy(count = s.count - 1)
            cur = n.next
          } else walking = false
        }
        s = s.copy(committed = committed, head = cur,
          tail = if (cur == Nil_) Nil_ else s.tail)
        committed
      }

      def nack(offset: Long): Unit =
        if (validate(offset) && nodes.containsKey(offset - 1)) {
          val n = nodes.getValue(offset - 1)
          if (n.status == Unset) nodes.updateValue(offset - 1, n.copy(status = Nacked))
        }

      def cancel(offset: Long): Unit =
        if (validate(offset) && nodes.containsKey(offset - 1)) {
          val n = nodes.getValue(offset - 1)
          if (n.status != Acked && n.status != Canceled)
            nodes.updateValue(offset - 1, n.copy(status = Canceled))
        }

      // same replay discipline as AckStateOp.process: deferred events from
      // prior triggers lead, receives replay in offset order, and an event
      // for a deferred message defers with it
      val out = scala.collection.mutable.ArrayBuffer.empty[WatermarkUpdate]
      val deferred = scala.collection.mutable.ArrayBuffer.empty[AckEvent]
      val deferredMsgs = scala.collection.mutable.Set.empty[Long]
      val prior = if (pending.exists()) pending.get().toSeq else Seq.empty
      val incoming = prior ++ rows
      val (receives, others) = incoming.partition(_.kind == "receive")
      receives.sortBy(_.offset).foreach { e =>
        if (deferredMsgs.nonEmpty) { deferred += e; deferredMsgs += e.offset }
        else if (!receive(e.offset) && s.count >= capacity) {
          deferred += e; deferredMsgs += e.offset
        }
      }
      var lastCommitted = s.committed
      others.sortBy(_.offset).foreach { e =>
        if (deferredMsgs.contains(e.offset - 1)) deferred += e
        else e.kind match {
          case "ack" =>
            val wm = ack(e.offset)
            if (wm >= 0 && wm != lastCommitted) {
              lastCommitted = wm
              out += WatermarkUpdate(key._1, key._2, wm, s.count, s.highestReceived)
            }
          case "nack" => nack(e.offset)
          case "cancel" => cancel(e.offset)
          case _ =>
        }
      }
      scalars.update(s)
      if (deferred.nonEmpty) pending.put(deferred.toArray)
      else if (pending.exists()) pending.clear()
      out.iterator
    }
  }
}
