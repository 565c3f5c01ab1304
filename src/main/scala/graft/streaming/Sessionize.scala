package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming sessionization: gap-based sessions as a
 * `flatMapGroupsWithState` operator with processing-time timeouts.
 *
 * `TextOps`/`SessionOps.q16Sessionize` is the batch shadow of this operator
 * (lag + running sum over a window); this is the live form — state per user
 * is one open session (bounded), a session closes when the gap since its
 * last event exceeds `gapMs`, and a GroupStateTimeout flushes sessions for
 * users that stop sending entirely (the part a pure watermark join cannot
 * express).
 *
 * Scale: state is O(active users), not O(events); closed sessions leave the
 * store immediately. Keys hash-partition across the cluster like any
 * stateful op.
 */
object Sessionize {

  final case class Event(userId: Long, tsMs: Long, eventId: Long)
  final case class OpenSession(startMs: Long, lastMs: Long, nEvents: Long)
  final case class ClosedSession(
      userId: Long, startMs: Long, endMs: Long, nEvents: Long, durationMs: Long)

  def sessions(
      events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        process(gapMs))
  }

  private def process(gapMs: Long)(
      userId: Long,
      events: Iterator[Sessionize.Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]

    if (state.hasTimedOut) {
      // user went quiet past the gap: flush the open session
      state.getOption.foreach { s =>
        out += ClosedSession(userId, s.startMs, s.lastMs, s.nEvents, s.lastMs - s.startMs)
      }
      state.remove()
    } else {
      var cur = state.getOption
      events.toSeq.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
        cur match {
          case Some(s) if e.tsMs - s.lastMs <= gapMs =>
            cur = Some(s.copy(lastMs = math.max(s.lastMs, e.tsMs), nEvents = s.nEvents + 1))
          case Some(s) => // gap exceeded: close and start fresh
            out += ClosedSession(userId, s.startMs, s.lastMs, s.nEvents, s.lastMs - s.startMs)
            cur = Some(OpenSession(e.tsMs, e.tsMs, 1))
          case None =>
            cur = Some(OpenSession(e.tsMs, e.tsMs, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // flush if the user stays quiet for a full gap of wall time
        state.setTimeoutDuration(gapMs)
      }
    }
    out.iterator
  }
}
