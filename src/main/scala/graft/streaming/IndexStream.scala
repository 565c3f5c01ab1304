package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Live IVF index-maintenance monitor: the streaming twin of q113
 * (operators/SimilarityOps.scala) — arriving vectors assign to the FROZEN
 * trained centroids and each event-time window reports per-cell arrival
 * counts against the trained base distribution, flagging cells growing
 * past a multiple of the trained mean (the re-split / re-train trigger an
 * index at 100 TB watches between retrains; FAISS's add-after-train
 * contract says arrivals never retrain inline).
 *
 * Dataflow: assignment is STATELESS map-side work — the centroid table
 * rides into the plan as a literal and the codegen'd
 * [[graft.plans.NearestCentroid]] loop picks the cell (no join, no
 * shuffle); the only stateful op is ONE windowed count per (window,
 * cell), so state is O(windows × K) regardless of traffic. The split
 * test compares each cell's (base + window arrivals) against
 * `splitFactor ×` the TRAINED mean cell size — a driver constant — where
 * batch q113 uses the post-ingest global mean; a streaming cascade
 * (counts, then a cross-cell mean of those counts) is exactly the
 * two-level aggregation Structured Streaming forbids, and between
 * retrains the trained mean is the operationally meaningful yardstick.
 */
object IndexStream {

  private val Q = "1048576.0" // 2^20 fixed-point scale, as the trainer

  /** Windowed per-cell arrival load vs the trained base distribution.
    *
    * `df` must carry `embedding: array<float|double>` and event-time
    * `eventTimeCol`. `centroids` are the trained (cid, quantized-vector)
    * pairs (the q57/q113 representation); `baseCounts` maps cid → trained
    * cell size. Works identically on a batch frame (same plan minus the
    * watermark) — how the spec cross-checks stream ≡ batch. */
  def windowedCellLoad(df: DataFrame, eventTimeCol: String, windowLength: String,
                       watermarkDelay: String, centroids: Seq[(Int, Seq[Long])],
                       baseCounts: Map[Int, Long], splitFactor: Long,
                       extraKeys: Seq[String] = Nil): DataFrame = {
    require(centroids.nonEmpty, "need a trained centroid table")
    require(baseCounts.nonEmpty,
      "need the trained base distribution (an empty baseline would flag every cell)")
    require(splitFactor >= 1L, "splitFactor must be >= 1")
    val totBase = baseCounts.valuesIterator.sum
    val nCells = baseCounts.size.toLong
    val baseLit = typedlit(baseCounts)
    val base = if (df.isStreaming) df.withWatermark(eventTimeCol, watermarkDelay) else df
    base
      .withColumn("qv",
        expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * ${Q}d) AS BIGINT))"))
      .withColumn("cid",
        graft.plans.NearestCentroid.nearest_centroid(col("qv"), typedlit(centroids))("cid"))
      // extraKeys (e.g. source) subdivide the per-cell load for funnel
      // rollups without a second pass; the default shape is unchanged
      .groupBy(window(col(eventTimeCol), windowLength) +: extraKeys.map(col) :+ col("cid"): _*)
      .agg(count(lit(1)).as("n_new"))
      .withColumn("n_base", coalesce(element_at(baseLit, col("cid")), lit(0L)))
      .withColumn("growth_permille", expr("n_new * 1000 DIV greatest(n_base, 1L)"))
      // exact integer form of (n_base + n_new) > splitFactor × mean:
      // multiply through by the cell count instead of truncating the mean
      .withColumn("needs_split",
        (col("n_base") + col("n_new")) * lit(nCells) > lit(splitFactor * totBase))
      .select(col("window.start").as("window_start") +: extraKeys.map(col) :+
        col("cid").cast("string").as("cell") :+
        col("n_new") :+ col("n_base") :+ col("growth_permille") :+ col("needs_split"): _*)
  }
}
