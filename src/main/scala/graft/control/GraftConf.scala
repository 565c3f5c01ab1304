package graft.control

import org.apache.spark.sql.SparkSession

/**
 * The session configuration a production graft deployment sets — every
 * value chosen for the 100 TB / 1000-executor shape this library targets,
 * with the reasoning attached. `GraftConf(builder)` applies them;
 * local-mode tools (Bench/Profile/Verify) set the same knobs inline with
 * test-sized values.
 *
 * Why these and not others:
 *  - AQE + skew-join + coalesce: runtime re-planning is the only defense
 *    against the stats being wrong at petabyte scale — converts sort-merge
 *    to broadcast when a side turns out small, splits skewed partitions
 *    (the salting move, automated), and merges tiny post-shuffle
 *    partitions so reducer count tracks DATA, not a static conf.
 *  - shuffle.partitions as a FLOOR, not a tuning knob: with AQE coalescing
 *    enabled the initial number only caps parallelism; size it at
 *    ~2-3× total executor cores.
 *  - files.maxPartitionBytes 128 MiB: scan tasks sized so a row-group +
 *    decode buffers fit executor memory alongside shuffle state.
 *  - autoBroadcastJoinThreshold stays DEFAULT (10 MiB): every deliberate
 *    broadcast in this library is an explicit broadcast() hint — implicit
 *    giant broadcasts are how drivers die.
 *  - codegen.cache.maxEntries: a workload with ~100 distinct query shapes
 *    generates far more than the default 100 cached classes; an LRU that
 *    small recompiles (and re-JITs) in steady state.
 *  - RocksDB state store + unload-on-commit: bounded heap for streaming
 *    state of any size; required by transformWithState operators
 *    (AckStateTws, DelayGateTws).
 */
object GraftConf {
  val Settings: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    "spark.sql.codegen.cache.maxEntries" -> "5000",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.shuffle.partitions" -> "2000") // floor for ~1000 executors x 2-3 cores each; AQE coalesces down

  /** Apply the production settings to a session builder. Callers override
    * AFTER applying (e.g. shuffle.partitions for local runs). */
  def apply(b: SparkSession.Builder): SparkSession.Builder =
    Settings.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
