package graft.control

import scala.collection.mutable

/**
 * Job-group autoscaler: samples throughput, converts to a scale (worker
 * demand), and walks the Calibrating → Running → Hibernating state machine
 * with asymmetric windows — fast percentile-gated up-scale, slow down-scale,
 * hibernate after sustained zero traffic.
 *
 * Behavioral envelope mirrored from the reference autoscaler
 * (reference: uforwarder-core/.../controller/autoscalar/AutoScalar.java:30-120,
 *  ScaleState.java:14-31,132,210,314,353-440, AutoScalarConfiguration.java:11-27):
 *  - scale unit: max(msgsPerSec / 4000, bytesPerSec / 16MiB)
 *  - up-scale: p50 over the up window, bounded ×[1.2, 2.0]
 *  - down-scale: p99 over the down window, bounded ×[0.5, 0.8]
 *  - hibernate: sustained zero for the hibernate window; wake on traffic
 *
 * Pure Scala with an injectable clock — runs on the driver off
 * StreamingQueryListener throughput, feeding maxOffsetsPerTrigger /
 * executor-count decisions.
 */
object AutoScaler {
  val MessagesPerWorker: Double = 4000.0
  val BytesPerWorker: Double = 16.0 * 1024 * 1024

  def scaleOf(msgsPerSec: Double, bytesPerSec: Double): Double =
    math.max(msgsPerSec / MessagesPerWorker, bytesPerSec / BytesPerWorker)

  sealed trait Phase
  object Phase {
    case object Calibrating extends Phase
    case object Running extends Phase
    case object Hibernating extends Phase
  }

  final case class Config(
      calibrateMs: Long = 5 * 60 * 1000L,      // reach Running after this
      upWindowMs: Long = 5 * 60 * 1000L,       // p50 window
      downWindowMs: Long = 24 * 3600 * 1000L,  // p99 window
      hibernateMs: Long = 72 * 3600 * 1000L,   // zero-traffic window
      upPercentile: Double = 0.50,
      downPercentile: Double = 0.99,
      maxUpFactor: Double = 2.0,
      minUpFactor: Double = 1.2,
      maxDownFactor: Double = 0.8,
      minDownFactor: Double = 0.5)
}

final class AutoScaler(config: AutoScaler.Config = AutoScaler.Config()) {
  import AutoScaler._

  private final case class Sample(tsMs: Long, scale: Double)

  final case class GroupState(
      phase: Phase,
      scale: Double,
      lastNonZeroTsMs: Long,
      firstSampleTsMs: Long)

  private val samples = mutable.Map.empty[String, mutable.ArrayDeque[Sample]]
  private val states = mutable.Map.empty[String, GroupState]

  def state(group: String): Option[GroupState] = states.get(group)

  private def percentile(xs: Seq[Double], p: Double): Double = {
    if (xs.isEmpty) return 0.0
    val s = xs.sorted
    val rank = p * (s.size - 1)
    val lo = rank.toInt
    val hi = math.min(lo + 1, s.size - 1)
    val d = rank - lo
    s(lo) * (1 - d) + s(hi) * d
  }

  /** Feed one throughput sample for a job group; returns the current scale
    * decision. */
  def onSample(group: String, msgsPerSec: Double, bytesPerSec: Double, nowMs: Long): Double = {
    val sc = scaleOf(msgsPerSec, bytesPerSec)
    val buf = samples.getOrElseUpdate(group, mutable.ArrayDeque.empty)
    buf.append(Sample(nowMs, sc))
    val horizon = nowMs - math.max(config.downWindowMs, config.hibernateMs)
    while (buf.nonEmpty && buf.head.tsMs < horizon) buf.removeHead()

    val st = states.getOrElse(group,
      GroupState(Phase.Calibrating, math.max(sc, 1.0), nowMs, nowMs))
    val lastNonZero = if (sc > 0) nowMs else st.lastNonZeroTsMs

    val next = st.phase match {
      case Phase.Calibrating =>
        // during calibration track the observed max so under-provisioning
        // never throttles a new group
        val calibrated = math.max(st.scale, sc)
        if (nowMs - st.firstSampleTsMs >= config.calibrateMs)
          st.copy(phase = Phase.Running, scale = calibrated, lastNonZeroTsMs = lastNonZero)
        else st.copy(scale = calibrated, lastNonZeroTsMs = lastNonZero)

      case Phase.Running =>
        if (nowMs - lastNonZero >= config.hibernateMs)
          st.copy(phase = Phase.Hibernating, scale = 0.0, lastNonZeroTsMs = lastNonZero)
        else {
          val upWin = buf.view.filter(_.tsMs >= nowMs - config.upWindowMs).map(_.scale).toSeq
          // bounded to downWindowMs — the buffer itself is retained for the
          // longer hibernate horizon, and an unfiltered p99 would keep a
          // 48h-old spike holding the scale up for 72h
          val downWin = buf.view.filter(_.tsMs >= nowMs - config.downWindowMs).map(_.scale).toSeq
          val p50 = percentile(upWin, config.upPercentile)
          val p99 = percentile(downWin, config.downPercentile)
          var scale = st.scale
          if (p50 > scale) // up-scale, bounded x[1.2, 2.0]
            scale = math.min(math.max(p50, scale * config.minUpFactor), scale * config.maxUpFactor)
          else if (p99 < scale) // down-scale, bounded x[0.5, 0.8]
            scale = math.max(math.min(p99, scale * config.maxDownFactor), scale * config.minDownFactor)
          st.copy(scale = scale, lastNonZeroTsMs = lastNonZero)
        }

      case Phase.Hibernating =>
        if (sc > 0) // wake: back to calibration with at least one worker
          GroupState(Phase.Calibrating, math.max(sc, 1.0), nowMs, nowMs)
        else st
    }
    states(group) = next
    next.scale
  }

  /** Desired worker count = ceil(scale). */
  def desiredWorkers(group: String): Int =
    states.get(group).map(s => math.ceil(s.scale).toInt).getOrElse(1)
}
