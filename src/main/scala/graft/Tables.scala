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
