package graft.streaming

import scala.collection.mutable

/** Where consumer-group progress gets committed. Production would bind a
  * KafkaConsumer/AdminClient `commitAsync`; tests and the in-process
  * harness bind [[graft.sources.GraftBroker]]. */
trait CommitTarget {
  def commit(group: String, offsets: Map[(String, Int), Long]): Unit
}

/** [[CommitTarget]] over the in-process broker. */
final class BrokerCommitTarget extends CommitTarget {
  override def commit(group: String, offsets: Map[(String, Int), Long]): Unit =
    graft.sources.GraftBroker.commitGroup(group, offsets)
}

/**
 * Consumer-group offset-commit policy, mirrored from the reference fetcher
 * (AbstractKafkaFetcherThread.java:407-446 commit cadence, :492-501
 * keepalive eligibility):
 *
 *  - commits at most once per `cadenceMs` (reference: 1 s);
 *  - commits ONLY offsets that changed since the last commit — except that
 *    after `keepaliveMs` without any commit (reference: 60 s) it re-commits
 *    everything so the group doesn't age out of broker-side retention and
 *    lag tooling keeps seeing a live consumer;
 *  - offered watermarks are monotone per partition: a stale offer (smaller
 *    than what's already pending/committed) never rolls progress back.
 *
 * Why the engine needs this at all: Spark's own `source.commit` only fires
 * when a NEXT batch runs, so the final batch's progress stays invisible to
 * broker-side lag tooling until new data arrives. The engine instead
 * commits the ACK watermark (the contiguous-prefix guarantee from
 * AckTrackingQueue) through this policy after every batch — which is also
 * the reference's semantic: it commits the acked prefix, not the fetch
 * position.
 *
 * Single-threaded by contract (called from the foreachBatch driver thread),
 * like the reference's fetcher-thread-owned commit step.
 */
final class OffsetCommitter(
    target: CommitTarget,
    group: String,
    cadenceMs: Long = 1000L,
    keepaliveMs: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val pending = mutable.Map.empty[(String, Int), Long]
  private val committed = mutable.Map.empty[(String, Int), Long]
  private var lastCommitAt = Long.MinValue
  private var commitCount = 0L

  /** Merge new ack watermarks (monotone max per partition). */
  def offer(offsets: Map[(String, Int), Long]): Unit =
    offsets.foreach { case (tp, o) =>
      if (o >= 0 && o > pending.getOrElse(tp, Long.MinValue)) pending(tp) = o
    }

  /** Commit if due. Returns the offsets committed this tick (empty = none). */
  def tick(): Map[(String, Int), Long] = {
    val now = clock()
    if (lastCommitAt != Long.MinValue && now - lastCommitAt < cadenceMs) return Map.empty
    val changed = pending.filter { case (tp, o) => committed.getOrElse(tp, -1L) < o }.toMap
    val keepaliveDue =
      lastCommitAt != Long.MinValue && now - lastCommitAt >= keepaliveMs && committed.nonEmpty
    val toCommit =
      if (changed.nonEmpty) changed
      else if (keepaliveDue) committed.toMap // re-assert liveness, same offsets
      else Map.empty[(String, Int), Long]
    if (toCommit.nonEmpty) {
      target.commit(group, toCommit)
      toCommit.foreach { case (tp, o) => committed(tp) = o }
      lastCommitAt = now
      commitCount += 1
    }
    toCommit
  }

  def commits: Long = commitCount
  def committedOffsets: Map[(String, Int), Long] = committed.toMap
}
