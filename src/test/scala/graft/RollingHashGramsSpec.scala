package graft

import graft.plans.RollingHashGrams
import graft.plans.RollingHashGrams.rolling_hash_grams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RollingHashGramsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val (k, b, m) = (RollingHashGrams.K, RollingHashGrams.B, RollingHashGrams.M)

  /** The composable (per-gram rescan) formulation the expression replaces. */
  private val lambdaForm = expr(
    s"""CASE WHEN length(t) >= $k THEN
       |  transform(sequence(1, length(t) - ${k - 1}), i ->
       |    aggregate(transform(sequence(0, ${k - 1}),
       |      j -> CAST(ascii(substring(t, i + j, 1)) AS BIGINT)),
       |      0L, (acc, c) -> (acc * $b + c) % $m))
       | ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)

  test("rolling recurrence equals the per-gram polynomial on random strings") {
    val pieces = Array("a", "b", "xyz", " ", "0", "9", "qq")
    val rnd = new scala.util.Random(11)
    val strs = (1 to 300).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString("")
    } ++ Seq("", "abc", "abcd", "abcde", "abcdef")
    val rows = strs.toDF("t")
      .select(rolling_hash_grams(col("t")).as("native"), lambdaForm.as("lambda"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch: $r")
    }
  }

  test("code-point semantics: multibyte and supplementary chars hash like ascii()") {
    // ascii() returns the code point of the first character in both Spark
    // and DuckDB; the expression must iterate code points, not chars/bytes
    val strs = Seq("héllo wörld", "日本語のテキストです", "mix 猫 and 🚀 rocket emoji!")
    val rows = strs.toDF("t")
      .select(rolling_hash_grams(col("t")).as("native"), lambdaForm.as("lambda"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).nonEmpty)
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch: $r")
    }
  }

  test("null yields null; short strings yield empty; codegen path exercised") {
    assert(Seq(Option.empty[String]).toDF("t")
      .select(rolling_hash_grams(col("t"))).head().isNullAt(0))
    assert(Seq("abcd").toDF("t")
      .select(rolling_hash_grams(col("t"))).head().getSeq[Long](0).isEmpty)
    val probe = spark.range(3)
      .select(rolling_hash_grams(concat(lit("abcdef"), col("id").cast("string"))).as("h"))
    assert(probe.queryExecution.executedPlan.toString.contains("*(1) Project [rolling_hash_grams"),
      probe.queryExecution.executedPlan.toString)
    assert(probe.collect().forall(_.getSeq[Long](0).size == 3))
  }
}
