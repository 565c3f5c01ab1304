package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Live distribution-drift monitor: the q90 chi-square drift statistic
 * (operators/ForwardingOps.scala) as a watermarked windowed streaming
 * aggregation — per event-time window and topic, how far has the value
 * distribution of the CURRENT traffic drifted from a REFERENCE histogram
 * trained on a trusted slice? A data pipeline runs exactly this between
 * "the corpus the model was tuned on" and "what ingest looks like right
 * now", and wants the answer per window while the window is still open —
 * not in next night's batch.
 *
 * Dataflow: ONE streaming aggregation per (window, topic) computes the
 * live bucket histogram via [[graft.functions.HistogramSketch]] (exact,
 * merge-invariant, bounded by the clamped bucket domain — the cascade
 * "per-bucket counts then per-window rollup" that Structured Streaming
 * forbids, folded into one state row). The chi-square against the
 * reference is then a STATELESS projection: the reference histogram is a
 * driver-resident literal (bounded buckets, the centroid-table pattern),
 * iterated with `aggregate()` over its entries. Integer fixed-point
 * arithmetic is bit-identical to q90's batch formula:
 * e1000 = ref_c·cur_n·1000 DIV ref_n,
 * contrib = (cur_c·1000 − e1000)² DIV (e1000·1000).
 *
 * State per (window, topic): one histogram of ≤ domain-size (bucket,
 * count) pairs, dropped when the watermark passes the window end.
 */
object DriftStream {

  /** Chi-square drift per event-time window against `ref`.
    *
    * `df` must carry `topic: string`, a long `bucket` column CLAMPED to a
    * bounded domain (the HistogramSketch precondition), and event-time
    * `eventTimeCol`. `ref` maps bucket → reference count; buckets absent
    * from `ref` contribute mass to `cur_n` but no chi-square term —
    * exactly q90's `ref_c > 0` rule (report them via `novel_buckets`).
    * Works identically on a batch frame (same plan minus the watermark),
    * which is how the spec cross-checks stream ≡ batch. */
  def windowedDrift(df: DataFrame, eventTimeCol: String, windowLength: String,
                    watermarkDelay: String, ref: Map[Long, Long]): DataFrame = {
    require(ref.nonEmpty && ref.valuesIterator.forall(_ > 0),
      "reference histogram must be non-empty with positive counts")
    val refSorted = ref.toSeq.sortBy(_._1)
    val refN = refSorted.map(_._2).sum
    val refBuckets = typedlit(refSorted.map(_._1))
    val refCounts = typedlit(refSorted.map(_._2))
    val base = if (df.isStreaming) df.withWatermark(eventTimeCol, watermarkDelay) else df
    base
      .filter(col("bucket").isNotNull)
      .groupBy(window(col(eventTimeCol), windowLength), col("topic"))
      .agg(
        count(lit(1)).as("cur_n"),
        graft.functions.HistogramSketch.hist_sketch(col("bucket")).as("cur"))
      .withColumn("ref_buckets", refBuckets)
      .withColumn("ref_counts", refCounts)
      // Σ over reference entries — q90's integer formula verbatim; the
      // lambdas read cur_n and the cur map as outer column references.
      // s.e = 0 (a reference bucket whose expected count rounds to zero in
      // a near-empty window) contributes 0 instead of a NULL-poisoning
      // division — q90's batch windows are too large to hit this.
      .withColumn("chi2_millis", expr(
        s"""aggregate(transform(sequence(0, ${refSorted.size - 1}), i -> named_struct(
           |    'c', CAST(coalesce(element_at(cur, ref_buckets[i]), 0) AS BIGINT) * 1000,
           |    'e', ref_counts[i] * cur_n * 1000 DIV $refN)),
           |  0L, (acc, s) -> acc + CASE WHEN s.e > 0
           |    THEN (s.c - s.e) * (s.c - s.e) DIV (s.e * 1000) ELSE 0L END)""".stripMargin))
      // traffic in buckets the reference never saw — q90 reports these
      // separately instead of folding them into the statistic
      .withColumn("novel_mass", expr(
        "aggregate(map_entries(cur), 0L, (acc, e) -> " +
          "acc + CASE WHEN array_position(ref_buckets, e.key) = 0 THEN e.value ELSE 0L END)"))
      .select(col("window.start").as("window_start"), col("topic"),
        col("cur_n"), col("chi2_millis"), col("novel_mass"))
  }
}
