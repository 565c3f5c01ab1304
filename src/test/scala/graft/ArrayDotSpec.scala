package graft

import graft.plans.ArrayDot.{array_cosine, array_dot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ArrayDotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("array_dot matches the fold-based formulation bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f))).toDF("a", "b")
      .withColumn("ad", expr("transform(a, x -> CAST(x AS DOUBLE))"))
      .withColumn("bd", expr("transform(b, x -> CAST(x AS DOUBLE))"))
    val rows = df.select(
      array_dot(col("ad"), col("bd")).as("native"),
      expr("aggregate(zip_with(ad, bd, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("fold"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.head.getDouble(0) == 32.0)
  }

  test("array_dot accepts float arrays directly (no cast pass)") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(array_dot(col("a"), col("b"))).head().getDouble(0) == 11.0)
  }

  test("array_cosine of identical vectors is 1") {
    val df = Seq((Array(0.6f, 0.8f), Array(0.6f, 0.8f))).toDF("a", "b")
    val c = df.select(array_cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(array_dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("bigint arrays: exact integer dot, matches the fold path") {
    val df = Seq(
      (Array(1L, -2L, 3L), Array(4L, 5L, 6L)),
      (Array(1L << 21, 1L << 21, -(1L << 21)), Array(1L << 21, -(1L << 21), 1L << 21)))
      .toDF("a", "b")
    val rows = df.select(
      array_dot(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("fold"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows.head.getLong(0) == 12L)
    // quantizer-scale magnitudes stay exact (no double rounding at 2^42)
    assert(rows(1).getLong(0) == -(1L << 42))
  }

  test("bigint arrays: length mismatch yields null (like zip_with+aggregate)") {
    val df = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
    assert(df.select(array_dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("registered for SQL (runtime registration; extensions use same builder)") {
    // the suite may inherit a session built without spark.sql.extensions —
    // register on the live session, which is what GraftExtensions does at
    // session build time
    graft.plans.ArrayDot.register(spark)
    val r = spark.sql("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("codegen path is exercised (no fallback errors on wide batch)") {
    val n = 10000
    val df = spark.range(n).select(
      expr("transform(sequence(0, 63), i -> CAST(i * id AS DOUBLE))").as("v"))
    val s = df.select(sum(array_dot(col("v"), col("v"))).as("s")).head().getDouble(0)
    assert(s > 0)
  }

  test("type check rejects non-numeric arrays") {
    val df = Seq((Array("x"), Array("y"))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(array_dot(col("a"), col("b"))).head()
    }
    assert(e.getMessage.toLowerCase.contains("array_dot") ||
      e.getMessage.toLowerCase.contains("data type"))
  }
}
