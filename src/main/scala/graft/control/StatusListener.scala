package graft.control

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

import scala.collection.concurrent.TrieMap

/**
 * Push-based bridge from Spark's streaming progress events to the
 * [[JobStatusStore]] — the worker side of the reference's heartbeat loop
 * (reference: ControllerWorkerService.java:46-260 ingests a worker's
 * JobStatus every 1 s; the worker derives it from live consumer/dispatcher
 * task counters, job_status.proto:16-52). Where [[ScalingLoop.tick]] POLLS
 * `query.lastProgress` on the caller's cadence (and can miss short-lived
 * batches between ticks), this listener receives EVERY progress event and
 * lets the store's own cadence gate do the 1 s coalescing.
 *
 * Field mapping (JobStatusRecord <- StreamingQueryProgress):
 *  - jobGroupId        <- query name (fall back to the stable query id)
 *  - readOffset        <- sum of per-partition end offsets over sources
 *                         whose offset JSON parses as graft-queue offsets
 *                         (`{"topic":{"part":offset}}`); -1 when no source
 *                         exposes that shape (e.g. MemoryStream)
 *  - commitOffset      <- same sum over source START offsets — the position
 *                         the checkpoint had durably committed when the
 *                         batch began (Kafka "next to commit" convention)
 *  - messages/bytes ps <- processedRowsPerSecond (NaN-guarded); bytes via
 *                         the caller's per-message estimate
 *  - inflight          <- state-operator total rows (records held in state
 *                         = the engine's in-flight set, SURVEY §2.8)
 *  - cpuUsage          <- triggerExecution ms / wall ms since the previous
 *                         progress event of this query (busy fraction of
 *                         one driver-visible pipeline, clamped to [0,1])
 *  - recordsProduced   <- sink.numOutputRows (−1 = sink didn't report)
 *  - state             <- RUNNING on progress; FAILED/CANCELED on
 *                         termination (always lands: the store's cadence
 *                         gate coalesces same-state records only)
 */
final class StatusListener(
    store: JobStatusStore,
    bytesPerMsgEstimate: Double = 1024.0,
    clock: () => Long = () => System.currentTimeMillis())
  extends StreamingQueryListener {

  // query id -> group name, recorded at start so termination (which carries
  // no name) can be attributed; query id -> last event wall-clock for the
  // busy-fraction denominator
  private val groupOf = TrieMap.empty[java.util.UUID, String]
  private val lastEventMs = TrieMap.empty[java.util.UUID, Long]

  override def onQueryStarted(e: QueryStartedEvent): Unit = {
    groupOf.put(e.id, Option(e.name).filter(_.nonEmpty).getOrElse(e.id.toString))
    ()
  }

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val group = groupOf.getOrElse(p.id,
      Option(p.name).filter(_.nonEmpty).getOrElse(p.id.toString))

    // total log position across sources speaking the graft-queue offset
    // dialect; sources with other offset shapes simply don't contribute
    def offsetTotal(json: String): Option[Long] =
      Option(json).flatMap(j =>
        scala.util.Try(graft.sources.GraftQueue.offsetsFromJson(j)
          .values.map(_.values.sum).sum).toOption)
    val readTotals = p.sources.toSeq.flatMap(s => offsetTotal(s.endOffset))
    val commitTotals = p.sources.toSeq.flatMap(s => offsetTotal(s.startOffset))

    val tsMs = scala.util.Try(java.time.Instant.parse(p.timestamp).toEpochMilli)
      .getOrElse(clock())
    val busy = {
      val trigger = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue()).getOrElse(0L)
      val prev = lastEventMs.put(p.id, tsMs)
      prev.filter(_ < tsMs)
        .map(b => math.min(1.0, trigger.toDouble / (tsMs - b)))
        .getOrElse(0.0)
    }
    def nanSafe(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d
    val msgsPerSec = nanSafe(p.processedRowsPerSecond)

    store.ingest(JobStatusRecord(
      jobGroupId = group,
      state = "RUNNING",
      readOffset = if (readTotals.isEmpty) -1L else readTotals.sum,
      commitOffset = if (commitTotals.isEmpty) -1L else commitTotals.sum,
      messagesPerSec = msgsPerSec,
      bytesPerSec = msgsPerSec * bytesPerMsgEstimate,
      totalMessagesInflight = p.stateOperators.map(_.numRowsTotal).sum,
      totalBytesInflight = 0L,
      cpuUsage = busy,
      recordsProduced = Option(p.sink).map(_.numOutputRows).getOrElse(-1L),
      tsMs = tsMs))
    ()
  }

  override def onQueryIdle(e: QueryIdleEvent): Unit = ()

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    // state transition: the store's gate never coalesces it away
    groupOf.remove(e.id).foreach { group =>
      lastEventMs.remove(e.id)
      store.ingest(JobStatusRecord(
        jobGroupId = group,
        state = if (e.exception.isDefined) "FAILED" else "CANCELED",
        readOffset = -1L, commitOffset = -1L,
        messagesPerSec = 0.0, bytesPerSec = 0.0,
        totalMessagesInflight = 0L, totalBytesInflight = 0L,
        cpuUsage = 0.0, recordsProduced = -1L, tsMs = clock()))
    }
  }
}
