package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Live audit aggregation: per-topic, per-event-time-window message counts
 * plus an approximate distinct-offset count over the message stream — the
 * reference's AUDIT job type (`AUDIT_TYPE_EXACT_UNIQ` /
 * `AUDIT_TYPE_APPROX_UNIQ`, spec-only enums at
 * /root/reference/idl/src/main/proto/data/kafka/data-transfer/job.proto:313-334)
 * run as a Structured Streaming query instead of a batch sweep (q12/q15).
 *
 * Why approximate on the live path: Spark (correctly) rejects distinct
 * aggregations on streaming frames — exact distinct state is unbounded
 * per group until the window closes. The KMV sketch
 * ([[graft.functions.KmvSketch]]) is the streaming-shaped answer: ≤ 2k
 * longs of state per (window, topic) in the state store regardless of
 * cardinality, map-side combinable, and its estimate is engine-
 * reproducible (same construction the batch audit q15 verifies against
 * DuckDB). Exact audits remain a batch sweep (q12) where the input is
 * finite by definition.
 *
 * Scale design: watermarked tumbling windows — state per (window, topic)
 * is dropped once the watermark passes the window end, so the state store
 * stays bounded by (topics × windows inside the watermark horizon).
 */
object AuditStream {

  /** `df` must carry `topic: string`, `offset: long` and an event-time
    * timestamp column `eventTimeCol`. Works identically on a batch frame
    * (backfill audit over the same tables — same plan minus the watermark),
    * which is how the spec cross-checks the streaming result. */
  def windowedAudit(df: DataFrame, eventTimeCol: String, windowLength: String,
                    watermarkDelay: String): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(eventTimeCol, watermarkDelay) else df
    base
      .withColumn("h",
        graft.plans.TextKernels.md5_prefix60(col("offset").cast("string").cast("binary")))
      .groupBy(window(col(eventTimeCol), windowLength), col("topic"))
      .agg(
        count(lit(1)).as("n"),
        graft.functions.KmvSketch.kmv_estimate(col("h")).as("approx_uniq"))
      .select(col("window.start").as("window_start"), col("topic"),
        col("n"), col("approx_uniq"))
  }
}
