package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Live corpus-diversity monitor: the distinct-n metric of batch q127
 * (operators/TextOps.scala) per event-time window and source, over
 * ARRIVING documents — the earliest signal that a source has collapsed
 * into template spam (a crawler loop, a mirror, an SEO farm flooding one
 * page shape). Batch q127 finds it next night; this flags it while the
 * ingest window is still open.
 *
 * Why a sketch on the live path: exact distinct-gram counting keeps
 * state per DISTINCT GRAM — unbounded (the whole point of the metric is
 * that healthy sources keep minting new grams). [[graft.functions.KmvSketch]]
 * keeps the k smallest 60-bit gram hashes per (window, source): bounded
 * state, map-side combinable, and ORDER-INDEPENDENT (the k smallest
 * distinct hashes are the same set under any merge order), so
 * stream ≡ batch holds exactly, not just in expectation. Below k
 * distinct grams the sketch is exhaustive and the estimate is EXACT;
 * above, relative error is ~1/√k (k=256 → ~6%), far under the
 * collapse amplitudes worth alarming on (template spam drops diversity
 * by hundreds of permille).
 *
 * Dataflow: gram hashing is stateless map-side column work (tokenize,
 * slide an n-window, digest — the q127 gram definition verbatim); the
 * only stateful op is ONE windowed aggregation of two longs + one
 * k-element sketch per (window, source). State is O(windows × sources ×
 * k), independent of traffic.
 */
object DiversityStream {

  private val wsTokenRe = graft.operators.TextOps.wsTokenRe

  /** Windowed distinct-n diversity vs a per-source baseline.
    *
    * `df` must carry `source: string`, `text: string`, and event-time
    * `eventTimeCol`. `baseline` maps source → trained diversity permille
    * (q127's exact figure; sources absent from it report null baseline and
    * never flag). Flagging is ONE-SIDED: diversity COLLAPSE
    * (`drift_permille <= -collapseThrPermille`) is the spam signal —
    * rising diversity is benign vocabulary growth. Works identically on a
    * batch frame (same plan minus the watermark), which is how the spec
    * cross-checks stream ≡ batch. */
  def windowedDiversity(df: DataFrame, eventTimeCol: String, windowLength: String,
                        watermarkDelay: String, n: Int, kmvK: Int,
                        baseline: Map[String, Long],
                        collapseThrPermille: Long): DataFrame = {
    require(n >= 1, s"gram width must be >= 1, got $n")
    val base = if (df.isStreaming) df.withWatermark(eventTimeCol, watermarkDelay) else df
    val baselineLit =
      if (baseline.isEmpty) typedlit(Map("" -> 0L)) else typedlit(baseline)
    base
      .withColumn("toks", graft.plans.TextKernels.ws_tokens(lower(col("text"))))
      .withColumn("ntok", size(col("toks")))
      .filter(col("ntok") >= n)
      // 60-bit gram digests, one array per doc — q127's gram definition
      .withColumn("hs", transform(
        graft.plans.TextKernels.ws_grams(col("toks"), n),
        g => graft.plans.TextKernels.md5_prefix60(g)))
      .select(col(eventTimeCol), col("source"), posexplode(col("hs")).as(Seq("pos", "h")))
      .groupBy(window(col(eventTimeCol), windowLength), col("source"))
      .agg(
        sum(when(col("pos") === 0, 1L).otherwise(0L)).as("n_docs"),
        count(lit(1)).as("total_grams"),
        graft.functions.KmvSketch.kmv_estimate(col("h"), kmvK).as("est_distinct"))
      .withColumn("est_permille",
        floor(col("est_distinct") * 1000 / col("total_grams")).cast("long"))
      .withColumn("baseline_permille", element_at(baselineLit, col("source")))
      .withColumn("drift_permille", col("est_permille") - col("baseline_permille"))
      .withColumn("collapsed",
        coalesce(col("drift_permille") <= -collapseThrPermille, lit(false)))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("total_grams"), col("est_distinct"),
        col("est_permille"), col("baseline_permille"),
        col("drift_permille"), col("collapsed"))
  }
}
