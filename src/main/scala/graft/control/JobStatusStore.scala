package graft.control

import scala.collection.concurrent.TrieMap

/**
 * Worker-reported job status with the full proto field set
 * (reference: idl/.../job_status.proto:16-52 — JobStatus.state +
 * KafkaConsumerTaskStatus read/commit offsets, msgs/bytes rates, inflight
 * totals, cpu_usage + KafkaDispatcherTaskStatus.num_records_produced).
 */
final case class JobStatusRecord(
    jobGroupId: String,
    state: String, // JobState: RUNNING | CANCELED | FAILED | ...
    readOffset: Long, // next offset to be read (Kafka convention)
    commitOffset: Long, // next offset to be committed
    messagesPerSec: Double,
    bytesPerSec: Double,
    totalMessagesInflight: Long,
    totalBytesInflight: Long,
    cpuUsage: Double, // fraction of one core
    recordsProduced: Long, // dispatcher-task status (LOAD_GEN jobs)
    tsMs: Long)

/**
 * Retained job-status history — the StoredJobStatus store the reference
 * master keeps (reference: ControllerWorkerService.java:46-260 ingests
 * worker heartbeats every 1 s into a `Store<Long, StoredJobStatus>`;
 * job-status TTL 1 h, application-uforwarder-controller.yaml:94-109).
 *
 * Built ON TtlRegistry: each accepted heartbeat is one TTL'd entry keyed
 * (group, tsMs), so expiry and purge semantics are exactly the worker
 * registry's. Ingest is cadence-gated per group (reference cadence 1 s):
 * heartbeats arriving faster are coalesced to the newest — the store's
 * granularity is the reporting cadence, not the caller's enthusiasm.
 *
 * The autoscaler feeds FROM this store ([[driveScaler]]) rather than from
 * ad-hoc snapshots: every retained sample reaches the scale state machine
 * exactly once, in timestamp order, even if the driver loop calling it
 * runs at a different (or irregular) cadence than ingest.
 */
final class JobStatusStore(
    ttlMs: Long = 3600 * 1000L,
    cadenceMs: Long = 1000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  // one TTL'd registry PER GROUP, keyed by sample timestamp: history(g)
  // and driveScaler(g) touch only that group's own samples — with G groups
  // at 1 s cadence / 1 h TTL a flat map would make every per-group call
  // scan G×3600 entries
  private val byGroup = TrieMap.empty[String, TtlRegistry[Long, JobStatusRecord]]
  // (ts, state) of the last ACCEPTED record per group — the cadence gate
  private val lastAcceptedTs = TrieMap.empty[String, (Long, String)]
  private val lastFedTs = TrieMap.empty[String, Long]

  /** Ingest one heartbeat; false = coalesced away (within the cadence gate
    * of the previously accepted record for the group). A BACKWARD timestamp
    * step (worker clock correction, restart with a skewed clock) is
    * accepted, not treated as "too soon" — gating on it would silently
    * starve the store and the scaler until the clock caught back up.
    * A STATE TRANSITION (RUNNING → FAILED/CANCELED) always lands: the
    * cadence gate coalesces same-state heartbeats only, so a terminal
    * status arriving within the cadence window of the last heartbeat is
    * never dropped. */
  def ingest(rec: JobStatusRecord): Boolean = {
    val last = lastAcceptedTs.get(rec.jobGroupId)
    val delta = last.map(rec.tsMs - _._1)
    val sameState = last.forall(_._2 == rec.state)
    if (sameState && delta.exists(d => d >= 0 && d < cadenceMs)) false
    else {
      // the feed cursor must never sit ABOVE an accepted record's
      // timestamp (a backward clock step would otherwise starve
      // driveScaler until the clock passed the old high-water mark);
      // for normal forward records this min is a no-op
      lastFedTs.updateWith(rec.jobGroupId)(_.map(f => math.min(f, rec.tsMs - 1)))
      byGroup.getOrElseUpdate(rec.jobGroupId,
        new TtlRegistry[Long, JobStatusRecord](ttlMs, clock)).put(rec.tsMs, rec)
      lastAcceptedTs.put(rec.jobGroupId, (rec.tsMs, rec.state))
      true
    }
  }

  /** Unexpired history for one group, oldest first. */
  def history(group: String): Seq[JobStatusRecord] =
    byGroup.get(group)
      .map(_.live.toSeq.sortBy(_._1).map(_._2)).getOrElse(Seq.empty)

  def latest(group: String): Option[JobStatusRecord] =
    history(group).lastOption

  /** Groups with at least one unexpired record. */
  def groups: Seq[String] = { purge(); byGroup.keys.toSeq.sorted }

  /** Drop expired samples; a group whose history fully expired is removed
    * ENTIRELY (registry + cadence/feed cursors), so transient group ids
    * don't leak and a reused id starts fresh instead of inheriting a stale
    * cadence gate. */
  def purge(): Int = {
    var n = 0
    byGroup.foreach { case (g, reg) =>
      n += reg.purge()
      if (reg.size == 0) {
        byGroup.remove(g); lastAcceptedTs.remove(g); lastFedTs.remove(g)
        ()
      }
    }
    n
  }

  /**
   * Drive the autoscaler from retained history: replay every record newer
   * than the last one fed (per group) into [[AutoScaler.onSample]], in
   * timestamp order. Returns the latest scale decision, None if no new
   * samples. Idempotent across calls — a record is fed once.
   */
  def driveScaler(scaler: AutoScaler, group: String): Option[Double] = {
    val from = lastFedTs.getOrElse(group, Long.MinValue)
    val fresh = history(group).filter(_.tsMs > from)
    if (fresh.isEmpty) None
    else {
      val decisions = fresh.map(r =>
        scaler.onSample(group, r.messagesPerSec, r.bytesPerSec, r.tsMs))
      lastFedTs.put(group, fresh.last.tsMs)
      decisions.lastOption
    }
  }

  /** History JSON for the management surface (StatusServer). */
  def historyJson: String = {
    import StatusServer.{escJson => esc}
    groups.map { g =>
      val recs = history(g).map { r =>
        s"""{"tsMs":${r.tsMs},"state":"${esc(r.state)}",""" +
          s""""readOffset":${r.readOffset},"commitOffset":${r.commitOffset},""" +
          s""""messagesPerSec":${r.messagesPerSec},"bytesPerSec":${r.bytesPerSec},""" +
          s""""totalMessagesInflight":${r.totalMessagesInflight},""" +
          s""""totalBytesInflight":${r.totalBytesInflight},""" +
          s""""cpuUsage":${r.cpuUsage},"recordsProduced":${r.recordsProduced}}"""
      }.mkString("[", ",", "]")
      s"""{"jobGroupId":"${esc(g)}","history":$recs}"""
    }.mkString("[", ",", "]")
  }
}

object JobStatusStore {
  /** Map one StreamingQueryProgress to the proto field set — what a worker
    * heartbeat reports, derived from Spark's own progress events:
    * read offset = sum of source end offsets is connector-specific, so the
    * OFFSET fields come from the caller's committer/source adapters; the
    * rate/inflight fields map directly. cpu_usage comes from the JVM OS
    * bean (process load scaled to one core, the proto's unit). */
  def fromProgress(
      jobGroupId: String,
      state: String,
      progress: org.apache.spark.sql.streaming.StreamingQueryProgress,
      readOffset: Long = -1L,
      commitOffset: Long = -1L,
      recordsProduced: Long = 0L): JobStatusRecord = {
    val inflightMsgs = progress.numInputRows
    val bytesPerSec = 0.0 // connector-specific; the queue source reports rows
    val cpu = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        val load = os.getProcessCpuLoad
        if (load.isNaN || load < 0) 0.0
        else load * Runtime.getRuntime.availableProcessors()
      case _ => 0.0
    }
    JobStatusRecord(
      jobGroupId = jobGroupId,
      state = state,
      readOffset = readOffset,
      commitOffset = commitOffset,
      messagesPerSec = Option(progress.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      bytesPerSec = bytesPerSec,
      totalMessagesInflight = inflightMsgs,
      totalBytesInflight = 0L,
      cpuUsage = cpu,
      recordsProduced = recordsProduced,
      tsMs = java.time.Instant.parse(progress.timestamp).toEpochMilli)
  }
}
