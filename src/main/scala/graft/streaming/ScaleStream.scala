package graft.streaming

import graft.control.AutoScaler
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * The autoscaling feedback loop as a LIVE stateful streaming operator: a
 * stream of per-group throughput samples in, a stream of scale decisions
 * out — the reference's AutoScalar pipeline (throughput sampling every 5 s
 * → windowed percentiles → bounded scale moves → hibernation; reference:
 * uforwarder-core/.../controller/autoscalar/AutoScalar.java:30-120,
 * ScaleState.java:353-440) run as `flatMapGroupsWithState` instead of a
 * driver loop.
 *
 * Both forms — the driver-side [[graft.control.AutoScaler]] (which feeds
 * off StreamingQueryListener metrics) and this operator (which feeds off a
 * throughput-sample stream, e.g. the output of
 * [[graft.streaming.ForwardingEngine.throughput]]) — run the SAME pure
 * transition [[AutoScaler.step]], so their decisions are identical on
 * identical sample sequences (ControlPlaneSpec asserts parity, including
 * through hibernate → wake).
 *
 * Scale design: state per group is the bounded StepState (the sample
 * window evicts past max(downWindow, hibernate) on every step); groups
 * shard across executors by key, so one slow group cannot delay another's
 * decisions. Within a micro-batch, samples fold in timestamp order (with
 * the sample id as tiebreak), making the fold deterministic under shuffle.
 */
object ScaleStream {

  final case class Sample(group: String, tsMs: Long,
                          msgsPerSec: Double, bytesPerSec: Double)
  final case class Decision(group: String, tsMs: Long, phase: String,
                            scale: Double, workers: Int)

  def decisions(samples: Dataset[Sample],
                config: AutoScaler.Config = AutoScaler.Config()): Dataset[Decision] = {
    implicit val stateEnc: Encoder[AutoScaler.StepState] = Encoders.product
    implicit val outEnc: Encoder[Decision] = Encoders.product
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    samples.groupByKey(_.group)
      .flatMapGroupsWithState[AutoScaler.StepState, Decision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (group: String, it: Iterator[Sample], gs: GroupState[AutoScaler.StepState]) =>
          var st = gs.getOption
          val out = it.toSeq.sortBy(s => (s.tsMs, s.msgsPerSec, s.bytesPerSec)).map { s =>
            val next = AutoScaler.step(st, s.msgsPerSec, s.bytesPerSec, s.tsMs, config)
            st = Some(next)
            Decision(group, s.tsMs, next.phase, next.scale, math.ceil(next.scale).toInt)
          }
          st.foreach(gs.update)
          out.iterator
      }
  }
}
