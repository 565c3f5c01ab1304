package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins each native text kernel to the composable Spark formulation it
  * replaced, row-for-row, over adversarial inputs (unicode multi-byte,
  * runs of every delimiter byte, empties, shorts, nulls) AND the real
  * sf0.001 corpus — the kernels' exactness contract (the SQL oracles keep
  * the composable form, so any drift would also fail the oracle gate). */
class TextKernelsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import graft.plans.TextKernels._

  private def adversarial = {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      "plain words here",
      "  leading  and   trailing   ",
      "tabs\tand\nnewlines\rand\ffeeds mixed  \t\n",
      "", " ", "\t\n\r\f", "one",
      "unicode …héllo wörld… 中文 分词 🙂 emoji",
      "exact five!", "abcd", "abcde", "abcdef",
      "a b c d e f g h i j k l m n o p",
      "rep rep rep rep rep rep rep rep rep",
      null
    ).zipWithIndex.map { case (t, i) => org.apache.spark.sql.Row(i.toLong, t) }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
  }

  private def corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.filter(!(col("a") <=> col("b")))
    assert(bad.count() === 0, bad.take(3).mkString("; "))
  }

  private val wsRe = "[^ \\t\\n\\r\\f]+"

  test("ws_tokens == regexp_extract_all on adversarial + corpus rows") {
    Seq(adversarial, corpus).foreach { d =>
      assertSame(d.select(
        ws_tokens(col("text")).as("a"),
        regexp_extract_all(col("text"), lit(wsRe), lit(0)).as("b")))
      assertSame(d.select( // lowercased variant, the common call shape
        ws_tokens(lower(col("text"))).as("a"),
        regexp_extract_all(lower(col("text")), lit(wsRe), lit(0)).as("b")))
    }
  }

  // null text: the kernels are null-in → null-out (UnaryExpression), while
  // the composable forms inherit legacy quirks (size(null) = -1 ⇒ empty
  // array; substring(null) inside transform ⇒ [null]). Every call site
  // tokenizes corpus text that is never null, so the contract is pinned on
  // non-null rows and the null row is asserted null-out explicitly.
  test("ws_grams / ws_gram_md5_hex == transform(sequence, slice) forms") {
    Seq(3, 5).foreach { n =>
      Seq(adversarial.filter(col("text").isNotNull), corpus).foreach { d =>
        val toks = d.withColumn("toks",
          regexp_extract_all(lower(col("text")), lit(wsRe), lit(0)))
        assertSame(toks.select(
          ws_grams(col("toks"), n).as("a"),
          expr(s"""CASE WHEN size(toks) >= $n THEN
               | transform(sequence(1, size(toks) - ${n - 1}),
               |   i -> concat_ws(' ', slice(toks, i, $n)))
               | ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin).as("b")))
        assertSame(toks.select(
          ws_gram_md5_hex(col("toks"), n).as("a"),
          expr(s"""CASE WHEN size(toks) >= $n THEN
               | transform(sequence(1, size(toks) - ${n - 1}),
               |   i -> md5(CAST(concat_ws(' ', slice(toks, i, $n)) AS BINARY)))
               | ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin).as("b")))
      }
    }
  }

  test("char_shingles == array_distinct(transform(sequence, substring))") {
    Seq(adversarial.filter(col("text").isNotNull), corpus).foreach { d =>
      assertSame(d.select(
        char_shingles(col("text"), 5).as("a"),
        expr("array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)), " +
          "i -> substring(text, i, 5)))").as("b")))
    }
  }

  test("kernels are null-in, null-out") {
    val n = adversarial.filter(col("text").isNull)
      .select(ws_tokens(col("text")).as("t"),
        ws_grams(ws_tokens(col("text")), 3).as("g"),
        char_shingles(col("text"), 5).as("s"),
        md5_prefix60(col("text")).as("m"))
      .head()
    assert(n.isNullAt(0) && n.isNullAt(1) && n.isNullAt(2) && n.isNullAt(3))
  }

  test("md5_prefix60 == conv(substring(md5, 1, 15), 16, 10) on string and binary") {
    Seq(adversarial, corpus).foreach { d =>
      assertSame(d.select(
        md5_prefix60(col("text")).as("a"),
        expr("CAST(conv(substring(md5(CAST(text AS BINARY)), 1, 15), 16, 10) AS BIGINT)")
          .as("b")))
      assertSame(d.select(
        md5_prefix60(col("text").cast("binary")).as("a"),
        expr("CAST(conv(substring(md5(CAST(text AS BINARY)), 1, 15), 16, 10) AS BIGINT)")
          .as("b")))
    }
  }
}
