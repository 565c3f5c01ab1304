package graft

import graft.plans.WsTokenCount.ws_token_count
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WsTokenCountSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val regexForm =
    size(regexp_extract_all(col("t"), lit(graft.operators.TextOps.wsTokenRe), lit(0)))
      .cast("long")

  test("hand-picked edges match the regexp idiom") {
    val df = Seq(
      "", " ", "   ", "a", " a ", "a b", "a  b", "\ta\nb\r c\fd ",
      "múlti byté tökens ünïcode", "日本語 テキスト の 行", "a b", // nbsp is NOT a delimiter
      "one", "trailing space ", " leading", "\n\n\n", "x\ty\nz"
    ).toDF("t")
    val rows = df.select(ws_token_count(col("t")).as("native"), regexForm.as("re")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"mismatch on row $r"))
  }

  test("randomized strings (ascii + multibyte + delimiter runs) agree with the regexp idiom") {
    val pieces = Array(" ", "\t", "\n", "\r", "\f", "a", "bc", "défg", "猫", " ", "0")
    val rnd = new scala.util.Random(7)
    val strs = (1 to 500).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString("")
    }
    val rows = strs.toDF("t")
      .select(ws_token_count(col("t")).as("native"), regexForm.as("re")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null input yields null; SQL registration works; codegen path is exercised") {
    assert(Seq(Option.empty[String]).toDF("t")
      .select(ws_token_count(col("t"))).head().isNullAt(0))
    // a shared test session may predate GraftExtensions — register directly
    graft.plans.WsTokenCount.register(spark)
    assert(spark.sql("SELECT ws_token_count('a b  c')").head().getLong(0) == 3L)
    // whole-stage codegen must include the expression (not fall back) —
    // a range source keeps the projection from constant-folding away
    val probe = spark.range(3)
      .select(ws_token_count(concat(lit("a b x"), col("id").cast("string"))).as("c"))
    // "*(n)" marks operators inside a WholeStageCodegen stage
    val planStr = probe.queryExecution.executedPlan.toString
    assert(planStr.contains("*(1) Project [ws_token_count"), planStr)
    assert(probe.collect().map(_.getLong(0)).forall(_ == 3L))
  }
}
