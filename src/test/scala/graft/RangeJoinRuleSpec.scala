package graft

import graft.plans.RewriteRangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The band-join bucketing rule must produce the identical result set as
  * the nested-loop plan, eliminate the BNLJ for pure theta band joins, and
  * leave equi-joins and non-band joins untouched. */
class RangeJoinRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Inject the rule per-test (the suite may share a session built without
    * GraftExtensions) and set the width conf. */
  private def withWidth[T](w: Long)(f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteRangeJoin
    spark.conf.set(RewriteRangeJoin.WidthConf, w.toString)
    try f finally {
      spark.conf.unset(RewriteRangeJoin.WidthConf)
      spark.experimental.extraOptimizations = prev
    }
  }

  private def points = (0L until 500L).map(i => (i, i * 7 % 1000)).toDF("pid", "x")
  private def intervals = (0L until 40L).map(i => (i, i * 25L, i * 25L + 24L))
    .toDF("iid", "lo", "hi")
  // ragged intervals including an empty-range and a null-bound row
  private def ragged = Seq(
    (100L, Some(10L), Some(500L)), (101L, Some(990L), Some(30L)),
    (102L, None, Some(50L)), (103L, Some(0L), None))
    .toDF("iid", "lo", "hi")

  test("band join rewrites to a bucketed equi-join with identical results") {
    val plain = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withWidth(32L) {
      val df = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
        .select("pid", "iid")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
      assert(p.contains("graft_range_bucket"), p.take(1500))
      val rewritten = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rewritten == plain)
      assert(rewritten.nonEmpty)
    }
  }

  test("strict bounds, mirrored operand order, and BETWEEN all rewrite") {
    withWidth(32L) {
      val a = points.join(intervals, col("lo") <= col("x") && col("x") < col("hi"))
      assert(a.queryExecution.executedPlan.toString.contains("graft_range_bucket"))
      val b = points.join(intervals, col("x").between(col("lo"), col("hi")))
      assert(b.queryExecution.executedPlan.toString.contains("graft_range_bucket"))
      // results of the strict variant match its nested-loop twin
      val strictPlain = points.join(intervals, col("lo") <= col("x") && col("x") < col("hi"))
      assert(a.count() == strictPlain.count())
    }
  }

  test("null bounds and empty ranges drop rows, never crash or duplicate") {
    val plain = points.join(ragged, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    withWidth(16L) {
      val rewritten = points.join(ragged, col("x") >= col("lo") && col("x") <= col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rewritten == plain)
    }
  }

  test("joins with a cross-side equality conjunct are left untouched") {
    withWidth(32L) {
      val df = points.join(intervals,
        col("pid") % 40 === col("iid") && col("x") >= col("lo") && col("x") <= col("hi"))
      assert(!df.queryExecution.executedPlan.toString.contains("graft_range_bucket"))
    }
  }

  test("rule is inert without the width conf") {
    val df = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
    assert(!df.queryExecution.executedPlan.toString.contains("graft_range_bucket"))
  }

  test("q102 (price-tier banding) runs on the bucketed plan, not a nested loop") {
    withWidth(4000000L) { // q102 sets the conf itself; the injection is what this wrapper adds
      val df = SparkEntry.queries("q102_price_band")(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("graft_range_bucket"), p.take(1500))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
      assert(df.count() > 0)
    }
    spark.conf.unset(graft.plans.RewriteRangeJoin.WidthConf)
  }

  test("randomized differential: rule-on equals rule-off across widths and shapes") {
    val rnd = new scala.util.Random(20260813)
    (1 to 8).foreach { trial =>
      val nP = 50 + rnd.nextInt(200)
      val nI = 5 + rnd.nextInt(40)
      val span = 1 + rnd.nextInt(2000)
      val ps = (0 until nP).map(i => (i.toLong, rnd.nextInt(span).toLong)).toDF("pid", "x")
      val is = (0 until nI).map { i =>
        val lo = rnd.nextInt(span).toLong - 50
        // mix of proper, empty (lo > hi) and degenerate single-point ranges
        val hi = lo + (rnd.nextInt(3) match {
          case 0 => rnd.nextInt(200).toLong
          case 1 => -1L - rnd.nextInt(50).toLong
          case _ => 0L
        })
        (i.toLong, lo, hi)
      }.toDF("iid", "lo", "hi")
      val plain = ps.join(is, col("x") >= col("lo") && col("x") <= col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val width = 1L << (1 + rnd.nextInt(8)) // 2 .. 256
      val bucketed = withWidth(width) {
        ps.join(is, col("x") >= col("lo") && col("x") <= col("hi"))
          .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      }
      assert(bucketed == plain, s"trial $trial width $width diverged")
    }
  }

  test("q102 isolates the width conf in a private session; re-planning keeps the rewrite") {
    val testdata = new java.io.File("/root/testdata/sf0.001")
    assume(testdata.isDirectory)
    val s = spark.newSession()
    assert(s.conf.getOption(RewriteRangeJoin.WidthConf).isEmpty)
    val df = graft.operators.RelationalOps.q102PriceBand(s, testdata.getAbsolutePath)
    // the caller's session never sees the conf — later band joins there
    // must NOT silently inherit q102's width
    assert(s.conf.getOption(RewriteRangeJoin.WidthConf).isEmpty)
    // ...the frame lives on a private session that carries it
    assert(df.sparkSession ne s)
    assert(df.sparkSession.conf.getOption(RewriteRangeJoin.WidthConf)
      .contains(graft.operators.RelationalOps.BandBucketWidth.toString))
    assert(df.queryExecution.executedPlan.toString.contains("graft_range_bucket"))
    // the regression that motivated the private session: count()/write build
    // a FRESH QueryExecution — re-optimization must still find the rule
    // armed, not fall back to the nested-loop band join
    val replanned = df.filter(lit(true)).queryExecution.executedPlan.toString
    assert(replanned.contains("graft_range_bucket"), replanned.take(1500))
    assert(!replanned.contains("BroadcastNestedLoopJoin"), replanned.take(1500))
    assert(df.count() > 0)
  }

  test("residual predicates survive alongside the band") {
    withWidth(32L) {
      val plain = points.join(intervals,
          col("x") >= col("lo") && col("x") <= col("hi") && col("iid") % 2 === 0)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.conf.unset(RewriteRangeJoin.WidthConf)
      val reference = points.join(intervals,
          col("x") >= col("lo") && col("x") <= col("hi") && col("iid") % 2 === 0)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(plain == reference)
    }
  }
}
