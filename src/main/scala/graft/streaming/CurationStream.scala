package graft.streaming

import graft.operators.CurationPipeline
import graft.operators.CurationPipeline.GateStage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Live curation funnel: [[CurationPipeline]]'s first-failing gate
 * attribution per event-time window — the per-window "how much is each
 * rule costing us RIGHT NOW" report, where the batch funnel answers it
 * per corpus build. A spike in one stage's drop share mid-ingest (a
 * crawler that started emitting truncated pages, a source that switched
 * language) shows up in the window it happens, not next build.
 *
 * Dataflow: gate evaluation is the SHARED [[CurationPipeline.annotate]] —
 * stream and batch cannot drift because they are one implementation. All
 * supplied stages must be window-free per-row predicates
 * ([[CurationPipeline.statelessStages]] is the standard set; corpus-level
 * gates have live twins of their own — exact-dup is `StreamDedup`, the
 * memorization gate's batch annotation rides a corpus build). The only
 * stateful op is ONE windowed count per (window, source, stage) —
 * state O(windows × sources × stages).
 */
object CurationStream {

  /** Per-(window, source, stage) drop counts plus the kept row, with each
    * stage's drop share of the window's arrivals in permille.
    *
    * `df` must carry `source`, the gate columns (`text`, `lang`, ...),
    * and event-time `eventTimeCol`. Works identically on a batch frame
    * (same plan minus the watermark) — how the spec cross-checks
    * stream ≡ batch against [[CurationPipeline.run]]'s attribution. */
  def windowedFunnel(df: DataFrame, eventTimeCol: String, windowLength: String,
                     watermarkDelay: String,
                     stages: Seq[GateStage]): DataFrame = {
    val reserved = Set("window_start", "source", "n_docs", "kept", "kept_permille")
    val clash = stages.map(_.name).filter(reserved)
    require(clash.isEmpty,
      s"stage names collide with funnel output columns: ${clash.mkString(", ")}")
    val base = if (df.isStreaming) df.withWatermark(eventTimeCol, watermarkDelay) else df
    // pivot is unsupported on streams — the per-stage columns are plain
    // conditional sums (one aggregation, identical batch and streaming)
    val perStage = stages.map(s =>
      sum(when(col("drop_stage") === s.name, 1L).otherwise(0L)).as(s.name))
    val agg1 = Seq(count(lit(1)).as("n_docs"),
      sum(when(col("drop_stage").isNull, 1L).otherwise(0L)).as("kept")) ++ perStage
    CurationPipeline.annotate(base, stages)
      .groupBy(window(col(eventTimeCol), windowLength), col("source"))
      .agg(agg1.head, agg1.tail: _*)
      .select(Seq(col("window.start").as("window_start"), col("source"), col("n_docs")) ++
        stages.map(s => col(s.name)) ++ Seq(col("kept"),
        expr("kept * 1000 DIV n_docs").as("kept_permille")): _*)
  }
}
