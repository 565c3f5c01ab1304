package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Live semantic-decontamination monitor: the streaming twin of q122
 * (operators/SimilarityOps.scala) — arriving embedding rows are scored
 * against a FROZEN benchmark/eval suite and each event-time window reports,
 * per source, how many arrivals sit too close to some benchmark vector
 * (cosine >= tau). This is the ingest-time gate of the batch decon pass: a
 * crawler that starts swallowing an eval set shows up in the window it
 * happens, not at the next corpus-wide audit.
 *
 * Dataflow: scoring is STATELESS map-side work — the benchmark rides into
 * the plan as a literal of pre-NORMALIZED vectors (unit L2, computed once on
 * the driver), so per row the max cosine is max-dot / |v|: one fused
 * higher-order aggregate per row, no join, no shuffle, no per-row division
 * until the final permille report. The only stateful op is ONE windowed
 * count per (window, source), so state is O(windows × sources) regardless
 * of traffic — the same bound as DriftStream/IndexStream. Benchmark suites
 * are small by nature (an eval set vs a firehose); for suites beyond
 * literal/broadcast size, score against the q58 trained-IVF cells instead.
 */
object DeconStream {

  /** Windowed per-source leakage counts against the benchmark suite.
    *
    * `df` must carry `embedding: array<float|double>`, a string `groupCol`,
    * and event-time `eventTimeCol`. `benchmark` holds the raw benchmark
    * vectors (normalized here, once). `tauPermille` is the cosine flag
    * threshold ×1000 (e.g. 300 = 0.30). Works identically on a batch frame
    * (same plan minus the watermark) — how the spec cross-checks
    * stream ≡ batch. */
  def windowedLeakage(df: DataFrame, eventTimeCol: String, windowLength: String,
                      watermarkDelay: String, benchmark: Seq[Seq[Double]],
                      tauPermille: Long, groupCol: String = "source"): DataFrame = {
    require(benchmark.nonEmpty, "need a benchmark suite")
    require(benchmark.forall(b => math.sqrt(b.map(x => x * x).sum) > 0.0),
      "benchmark vectors must be nonzero (a zero vector has no direction)")
    val benchNorm: Seq[Seq[Double]] = benchmark.map { b =>
      val n = math.sqrt(b.map(x => x * x).sum)
      b.map(_ / n)
    }
    val base = if (df.isStreaming) df.withWatermark(eventTimeCol, watermarkDelay) else df
    base
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("bench_lit", typedlit(benchNorm))
      // max over the benchmark of dot(v, b̂): cosine × |v|, division deferred
      .withColumn("max_dot", expr(
        """aggregate(bench_lit, CAST(-1.0e308 AS DOUBLE), (acc, b) ->
          |  greatest(acc, aggregate(zip_with(v, b, (x, y) -> x * y),
          |    CAST(0.0 AS DOUBLE), (a, x) -> a + x)))""".stripMargin))
      .withColumn("norm", sqrt(expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, x) -> a + x)")))
      .withColumn("sim_permille",
        floor(col("max_dot") / col("norm") * 1000.0).cast("long"))
      .groupBy(window(col(eventTimeCol), windowLength), col(groupCol))
      .agg(count(lit(1)).as("n_arrivals"),
        sum(when(col("sim_permille") >= tauPermille, 1L).otherwise(0L)).as("n_flagged"),
        max("sim_permille").as("max_sim_permille"))
      .select(col("window.start").as("window_start"), col(groupCol),
        col("n_arrivals"), col("n_flagged"), col("max_sim_permille"))
  }
}
