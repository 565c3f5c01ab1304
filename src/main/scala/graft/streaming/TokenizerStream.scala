package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Live tokenizer-fit monitor: per event-time window and source, the
 * subword fertility (symbols per word, permille) of ARRIVING documents
 * under a trained BPE merge list, compared against the per-source
 * baseline the tokenizer was trained at (operators/TextOps.scala q118
 * trains the merges; q119 computes the baseline). Rising fertility on a
 * source means its live text no longer matches the trained
 * segmentation — the earliest cheap signal of domain shift a training-
 * data pipeline gets, and it wants the answer while the ingest window
 * is still open, not in next night's batch.
 *
 * Dataflow: all tokenizer work is STATELESS map-side column arithmetic —
 * each token wraps into the q118 symbol representation
 * (`regexp_replace(t, "(.)", " $1 ")`), the merge list applies as a
 * chain of plain `replace` calls (identical greedy non-overlapping
 * semantics as training), and per-row word/symbol counts fold with
 * `aggregate`. The only stateful op is ONE windowed aggregation of two
 * long sums per (window, source) — state is O(windows × sources),
 * independent of traffic. The baseline rides into the plan as a map
 * literal (the centroid-table pattern).
 *
 * The replace-chain applies the FIRST-k merges; monitoring uses a small
 * trained prefix (fertility under a merge prefix is a monotone proxy for
 * full-vocab fertility). A production build with a 30k-merge vocabulary
 * swaps in q119's path — a broadcast word→symbol-count dictionary join —
 * and keeps the chain only for dictionary misses; the streaming shape
 * (stateless enrich + one windowed sum) is unchanged.
 */
object TokenizerStream {

  private val wsTokenRe = graft.operators.TextOps.wsTokenRe

  /** Per-token symbol count under `merges` (applied in training order).
    * The wrap is the SHARED TextOps.wrapSymbols — identical semantics to
    * the batch trainer by construction, not by parallel implementation. */
  private def symbolsOf(tok: Column, merges: Seq[(String, String)]): Column = {
    val wrapped = graft.operators.TextOps.wrapSymbols(tok)
    val merged = merges.foldLeft(wrapped) { case (c, (l, r)) =>
      replace(c, lit(s" $l  $r "), lit(s" $l$r "))
    }
    size(split(trim(merged), "  ")).cast("long")
  }

  /** Windowed fertility vs baseline.
    *
    * `df` must carry `source: string`, `text: string`, and event-time
    * `eventTimeCol`. `baseline` maps source → trained fertility permille
    * (sources absent from it report `baseline_permille` null and never
    * flag). A |drift| ≥ `driftThrPermille` sets `drifted`. Works
    * identically on a batch frame (same plan minus the watermark) — how
    * the spec cross-checks stream ≡ batch. */
  def windowedFertility(df: DataFrame, eventTimeCol: String, windowLength: String,
                        watermarkDelay: String, merges: Seq[(String, String)],
                        baseline: Map[String, Long], driftThrPermille: Long): DataFrame = {
    require(merges.nonEmpty, "need at least one trained merge")
    val base = if (df.isStreaming) df.withWatermark(eventTimeCol, watermarkDelay) else df
    val baselineLit =
      if (baseline.isEmpty) typedlit(Map("" -> 0L)) else typedlit(baseline)
    base
      .withColumn("toks", graft.plans.TextKernels.ws_tokens(lower(col("text"))))
      .withColumn("words", size(col("toks")).cast("long"))
      .withColumn("symbols",
        aggregate(transform(col("toks"), t => symbolsOf(t, merges)),
          lit(0L), (acc, x) => acc + x))
      .filter(col("words") > 0)
      .groupBy(window(col(eventTimeCol), windowLength), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("words").as("words"),
        sum("symbols").as("symbols"))
      .withColumn("fertility_permille", expr("symbols * 1000 DIV words"))
      .withColumn("baseline_permille",
        element_at(baselineLit, col("source")))
      .withColumn("drift_permille",
        col("fertility_permille") - col("baseline_permille"))
      .withColumn("drifted",
        coalesce(abs(col("drift_permille")) >= driftThrPermille, lit(false)))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("words"), col("symbols"),
        col("fertility_permille"), col("baseline_permille"),
        col("drift_permille"), col("drifted"))
  }
}
