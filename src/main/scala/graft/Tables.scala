package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shared testdata loaders.
  *
  * `events.ts` has been generated both as parquet TIMESTAMP(NANOS) (which
  * Spark can only read as a raw epoch-nanos Long, via
  * `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP_MICROS (which
  * arrives as TIMESTAMP / TIMESTAMP_NTZ). Every downstream operator does
  * integer nanos arithmetic on `ts` — a double roundtrip would lose
  * precision at 1.7e18 — so this loader normalizes `ts` to epoch
  * nanoseconds as a Long for EITHER physical type. The DuckDB oracles read
  * the same files with `epoch_ns(ts)`, which treats the naive timestamp as
  * UTC wall-clock; the session timezone is pinned to UTC here so the
  * NTZ→instant interpretation matches bit-for-bit.
  */
object Tables {

  /** Scale-adaptive scan parallelism for CPU-dense per-row passes
    * (minhash signatures, tokenize + per-gram digests, vector distance
    * loops): when the parquet scan cannot yield at least `defaultParallelism`
    * split tasks — driver-known from the file listing, no job — the scan is
    * round-robin repartitioned so the per-byte-expensive work uses the whole
    * box instead of the one task a single small row group produces. At
    * scale the listing yields ≥ cores splits and this is the identity (no
    * exchange is ever added to a big scan); locally it converts the
    * dominant single-task compute stages into cores-wide stages. The
    * repartition is deterministic under retry (sortBeforeRepartition is on
    * by default) and every registered query's result is partitioning-
    * invariant (oracle-checked at local[4] and local[32]). */
  def spreadRead(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    if (fewScanSplits(spark, path))
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** True when a parquet scan of `path` cannot yield at least
    * `defaultParallelism` split tasks — driver-known from the file
    * listing alone, no job. The gate for the conditional repartitions
    * above: at scale this is false and no exchange is ever added. */
  def fewScanSplits(spark: SparkSession, path: String): Boolean = {
    val p = spark.sparkContext.defaultParallelism
    val maxSplit = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
      .stripSuffix("b").toLong
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(fsPath).filter(f => f.getPath.getName.endsWith(".parquet")
      || !f.getPath.getName.startsWith("_"))
    val splits = files.map(f => math.max(1L, (f.getLen + maxSplit - 1) / maxSplit)).sum
    splits < p
  }

  /** Conditionally spread a mid-pipeline frame whose DOWNSTREAM projection
    * is CPU-dense (per-gram digests, per-doc shingle explosions): when the
    * corpus scan behind it is smaller than the box (`fewScanSplits` on its
    * source table), round-robin repartition so the expensive projection
    * runs cores-wide; at scale the frame already carries ≥ cores
    * partitions from its source and this adds nothing. */
  def spreadIfTiny(df: DataFrame, tinyScan: Boolean): DataFrame =
    if (tinyScan) df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df

  /** Post-materialization parallelism guard for CPU-dense derivations:
    * AQE rightly coalesces a sliver's shuffle to one partition by SIZE,
    * but downstream per-row work (shingle intersects, Lloyd distance
    * loops) is priced per row, not per byte — re-spread a materialized
    * (checkpointed) frame across the box when it landed under the
    * session's core count. Identity at scale: a big frame materializes
    * with ≥ cores partitions and no exchange is added. */
  def spreadParts(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Label the Spark jobs an eager step schedules (guide §1.5: label your
    * jobs) — thread-local, cleared after, zero cost when no job runs. */
  def labeled[T](spark: SparkSession, desc: String)(f: => T): T = {
    spark.sparkContext.setJobDescription(desc)
    try f finally spark.sparkContext.setJobDescription(null)
  }

  /** events table with `ts` normalized to epoch-nanoseconds Long. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw // TIMESTAMP(NANOS) read as raw nanos — already the target shape
      case TimestampType | TimestampNTZType =>
        // unix_micros is exact integer math on the internal micros value;
        // ×1000 stays well inside Long range (epoch nanos ≈ 1.7e18 < 9.2e18)
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        sys.error(s"events.ts has unsupported type $other; expected long or timestamp")
    }
  }
}
