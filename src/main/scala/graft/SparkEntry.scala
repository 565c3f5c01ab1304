package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped by domain:
  *  - q01-q14: forwarding data-plane + control-plane ops (ForwardingOps)
  *  - q20-q24: relational analytics (RelationalOps)
  *  - q30-q35: text analysis + dedup (TextOps)
  *  - q40-q43: similarity search + hash sketches (SimilarityOps)
  *  - q44-q45: multimodal-column plumbing (MultimodalOps)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full routing pipeline (status -> code -> escalation -> destination). */
  def entry(spark: SparkSession): DataFrame =
    ForwardingOps.q02RouteDestinations(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ForwardingOps.queries ++ RelationalOps.queries ++ TextOps.queries ++
      SimilarityOps.queries ++ MultimodalOps.queries ++ PipelineOps.queries ++
      SessionOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-function-specific ops
    * (q41/q42/q45) which get the driver's rows-only check. */
  def oracleSql: Map[String, String] =
    ForwardingOps.oracles ++ RelationalOps.oracles ++ TextOps.oracles ++
      SimilarityOps.oracles ++ MultimodalOps.oracles ++ PipelineOps.oracles ++
      SessionOps.oracles
}
