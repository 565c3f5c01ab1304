package graft

import graft.plans.NearestCentroid.nearest_centroid
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NearestCentroidSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val books: Seq[(Int, Seq[Long])] =
    Seq((0, Seq(0L, 0L)), (3, Seq(10L, 0L)), (7, Seq(0L, 10L)))

  test("picks the argmin centroid by exact integer squared distance") {
    val df = Seq(
      (1L, Seq(1L, 1L)),    // d2: 2 / 82 / 82        -> cid 0
      (2L, Seq(9L, 2L)),    // d2: 85 / 5 / 145       -> cid 3
      (3L, Seq(-1L, 11L)))  // d2: 122 / 242 / 2      -> cid 7
      .toDF("vec_id", "qv")
    val out = df.select(col("vec_id"),
        nearest_centroid(col("qv"), typedlit(books)).as("best"))
      .select(col("vec_id"), col("best.cid"), col("best.d2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set((1L, 0, 2L), (2L, 3, 5L), (3L, 7, 2L)))
  }

  test("ties resolve to the FIRST book entry (cid-ascending books => lowest cid)") {
    // (5,0) is distance 25 from both (0,0) and (10,0)
    val df = Seq((1L, Seq(5L, 0L))).toDF("vec_id", "qv")
    val r = df.select(nearest_centroid(col("qv"), typedlit(books)).as("b"))
      .select(col("b.cid"), col("b.d2")).head()
    assert(r.getInt(0) == 0 && r.getLong(1) == 25L)
  }

  test("matches the least(struct(d2, cid)) formulation it replaces") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 100).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextInt(1 << 20).toLong)))
    val cents = (0 until 16).map(c => (c, Seq.fill(8)(rnd.nextInt(1 << 20).toLong)))
    val df = vecs.toDF("vec_id", "qv")
    val viaLeast = least(cents.map { case (cid, cq) =>
      struct(
        expr(s"aggregate(zip_with(qv, array(${cq.mkString(",")}), " +
          "(a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), (s, x) -> s + x)").as("d2"),
        lit(cid).as("cid"))
    }: _*)
    val rows = df.select(col("vec_id"),
        nearest_centroid(col("qv"), typedlit(cents)).as("nat"), viaLeast.as("ref"))
      .select(col("vec_id"), col("nat.cid"), col("nat.d2"),
        col("ref.cid"), col("ref.d2"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(3) && r.getLong(2) == r.getLong(4),
        s"vec ${r.getLong(0)}")
    }
  }

  test("ragged centroid, empty book, or null input yield null") {
    val ragged = Seq((0, Seq(1L, 2L, 3L)))
    val df = Seq((1L, Some(Seq(1L, 1L))), (2L, Option.empty[Seq[Long]]))
      .toDF("vec_id", "qv")
    assert(df.filter(col("vec_id") === 1)
      .select(nearest_centroid(col("qv"), typedlit(ragged))).head().isNullAt(0))
    assert(df.filter(col("vec_id") === 2)
      .select(nearest_centroid(col("qv"), typedlit(books))).head().isNullAt(0))
    assert(df.filter(col("vec_id") === 1)
      .select(nearest_centroid(col("qv"),
        typedlit(Seq.empty[(Int, Seq[Long])]))).head().isNullAt(0))
  }

  test("injected functions are SQL-callable (array_dot, nearest_centroid)") {
    // the extension may not own the shared suite session — register directly
    // (same builders GraftExtensions injects)
    graft.plans.ArrayDot.register(spark)
    org.apache.spark.sql.graft.Shims.registerFunction(spark, "nearest_centroid",
      exprs => graft.plans.NearestCentroid(exprs(0), exprs(1)))
    val r = spark.sql(
      """SELECT array_dot(array(1L, 2L), array(3L, 4L)) AS d,
        | nearest_centroid(array(9L, 2L),
        |   array(struct(0, array(0L, 0L)), struct(3, array(10L, 0L)))).cid AS cid""".stripMargin)
      .head()
    assert(r.getLong(0) == 11L && r.getInt(1) == 3)
  }

  test("overflow fails loudly (checked arithmetic) in both eval paths") {
    // |a-b| = 2^33 => d*d = 2^66 overflows a long; the contract is an
    // ArithmeticException like the oracle's BIGINT overflow error, never a
    // silent wrap
    val big: Seq[(Int, Seq[Long])] = Seq((0, Seq(-(1L << 32))))
    val df = Seq((1L, Seq(1L << 32))).toDF("vec_id", "qv")
    def run(): Unit =
      df.select(nearest_centroid(col("qv"), typedlit(big)).as("b"))
        .select(col("b.d2")).head()
    val eCg = intercept[Exception](run())
    assert(exceptionChain(eCg).exists(_.isInstanceOf[ArithmeticException]), eCg.toString)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val eInt = intercept[Exception](run())
      assert(exceptionChain(eInt).exists(_.isInstanceOf[ArithmeticException]), eInt.toString)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  private def exceptionChain(t: Throwable): List[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toList

  test("interpreted path agrees with codegen") {
    // force the interpreted path by evaluating via a filter on a literal
    // projection with codegen disabled
    val df = Seq((1L, Seq(9L, 2L))).toDF("vec_id", "qv")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r = df.select(nearest_centroid(col("qv"), typedlit(books)).as("b"))
        .select(col("b.cid"), col("b.d2")).head()
      assert(r.getInt(0) == 3 && r.getLong(1) == 5L)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
