package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Live hot-key detection: the Misra-Gries candidate sketch (the batch
 * q64 operator) as a watermarked windowed streaming aggregation — the
 * PROACTIVE form of the reference's reactive head-of-line-blocking
 * response (`BlockingQueueStubManager.java:43-376` cancels the head only
 * after a hot key has already jammed an ack queue; this surfaces the keys
 * that WILL, per event-time window, while the window is still open for
 * correction).
 *
 * Why a sketch on the live path: `groupBy(key).count()` over a stream
 * keeps state per DISTINCT KEY — unbounded. [[graft.functions.MisraGries]]
 * keeps k counters per (window, topic) group in the state store, is
 * map-side combinable (each trigger's partial sketches merge into the
 * stored one), and its candidate set provably contains every key with
 * frequency > n/(k+1) in the window. Downstream (the control plane, or a
 * batch verify pass like q64's) confirms exact counts for the handful of
 * candidates — sketch first, exact later, never unbounded state.
 *
 * State per (window, topic): k (key, count) pairs + one long, dropped
 * when the watermark passes the window end.
 */
object HotKeyStream {

  /** `df` must carry `topic: string`, `user_id: long` (non-null — filter
    * nulls upstream, the q64 precondition) and event-time `eventTimeCol`.
    * Works identically on a batch frame (same plan minus the watermark),
    * which is how the spec cross-checks stream ≡ batch. */
  def windowedHotKeys(df: DataFrame, eventTimeCol: String, windowLength: String,
                      watermarkDelay: String, k: Int): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(eventTimeCol, watermarkDelay) else df
    base
      .filter(col("user_id").isNotNull)
      .groupBy(window(col(eventTimeCol), windowLength), col("topic"))
      .agg(
        count(lit(1)).as("n"),
        graft.functions.MisraGries.mg_candidates(col("user_id"), k).as("candidates"))
      .select(col("window.start").as("window_start"), col("topic"),
        col("n"), col("candidates"))
  }
}
