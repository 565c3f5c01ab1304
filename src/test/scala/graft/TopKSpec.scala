package graft

import graft.plans.{RewriteWindowTopK, TopKStrategy}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def withTopK[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(RewriteWindowTopK)
    spark.experimental.extraStrategies = Seq(TopKStrategy)
    try f finally {
      spark.experimental.extraOptimizations = Nil
      spark.experimental.extraStrategies = Nil
    }
  }

  private def topkQuery = {
    val df = spark.range(100000).select(
      (col("id") % 97).as("key"),
      ((col("id") * 31) % 10007).as("score"),
      col("id"))
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .orderBy("key", "rank")
  }

  test("rewrite fires: plan contains the two-phase GraftTopKPerKey operator") {
    withTopK {
      val p = topkQuery.queryExecution.executedPlan.toString
      assert(p.contains("GraftTopKPerKey(final)"), p.take(2000))
      assert(p.contains("GraftTopKPerKey(partial)"), p.take(2000))
      assert(!p.contains("+- Window "), "window operator should have been replaced:\n" + p.take(2000))
      assert(!p.contains("WindowGroupLimit"),
        "Spark's own group-limit should have been subsumed:\n" + p.take(2000))
      // exactly one exchange between the phases; no sort needed by the op
      assert(!p.contains("!GraftTopKPerKey"), "invalid node (missing producedAttributes)")
    }
  }

  test("operator results are identical to the window formulation") {
    val expected = topkQuery.collect().map(_.toString) // plain window path
    val got = withTopK { topkQuery.collect().map(_.toString) }
    assert(got.length == expected.length)
    assert(got.sameElements(expected))
  }

  test("map-side pruning bounds the shuffle") {
    withTopK {
      val df = topkQuery
      df.collect()
      // 97 keys x 5 rows x 4 input partitions = max 1940 rows may cross the
      // exchange, out of 100k input rows
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("GraftTopKPerKey(partial)"))
    }
  }

  test("rn = 1 (argmin) rewrites to top-1 and matches the window result") {
    val df = spark.range(100000).select(
      (col("id") % 97).as("key"),
      ((col("id") * 31) % 10007).as("score"),
      col("id"))
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    def q = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).orderBy("key")
    val expected = q.collect().map(_.toString)
    withTopK {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("GraftTopKPerKey(final)"), p.take(2000))
      assert(q.collect().map(_.toString).sameElements(expected))
    }
  }

  test("rn = k for k > 1 is NOT top-k and must stay a window") {
    withTopK {
      val df = spark.range(1000).select((col("id") % 7).as("key"), col("id"))
      val w = Window.partitionBy("key").orderBy("id")
      val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 3)
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("GraftTopKPerKey"), p.take(1200))
      assert(q.count() == 7)
    }
  }

  test("no rewrite for rank filters the operator cannot serve") {
    withTopK {
      val df = spark.range(1000).select((col("id") % 7).as("key"), col("id"))
      val w = Window.partitionBy("key").orderBy("id")
      // rank >= bound is not a top-k shape — must stay a window
      val q = df.withColumn("rank", row_number().over(w)).filter(col("rank") >= 3)
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("Window"), p.take(1200))
      assert(!p.contains("GraftTopKPerKey"))
      assert(q.count() > 0)
    }
  }

  test("key-cap overflow degrades to the spill path with identical results") {
    // 20,011 distinct keys through a 64-key budget: virtually every key in
    // every task takes the overflow path (partial: unpruned pass-through;
    // final: external sort + stream-group). Results must be byte-identical
    // to the window formulation.
    val df = spark.range(200000).select(
      (col("id") % 20011).as("key"),
      ((col("id") * 131) % 99991).as("score"),
      col("id"))
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    def q = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3).orderBy("key", "rank")
    val expected = q.collect().map(_.toString)
    spark.conf.set(graft.plans.TopKPerKeyExec.MaxKeysConf, "64")
    try withTopK {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("GraftTopKPerKey(final)"), plan.take(1500))
      val got = q.collect().map(_.toString)
      assert(got.length == expected.length)
      assert(got.sameElements(expected))
    } finally spark.conf.unset(graft.plans.TopKPerKeyExec.MaxKeysConf)
  }

  test("global top-k (empty key set) is immune to the key cap") {
    spark.conf.set(graft.plans.TopKPerKeyExec.MaxKeysConf, "1")
    try withTopK {
      val df = spark.range(100000).select(col("id"), ((col("id") * 31) % 10007).as("score"))
      val w = Window.orderBy(col("score").desc, col("id"))
      val q = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      assert(q.count() == 10)
    } finally spark.conf.unset(graft.plans.TopKPerKeyExec.MaxKeysConf)
  }

  test("q40-style query under the operator still matches its plain result") {
    val dir = "/root/testdata/sf0.001"
    val plain = SparkEntry.queries("q40_ann_cosine")(spark, dir).collect().map(_.toString)
    val rewritten = withTopK {
      SparkEntry.queries("q40_ann_cosine")(spark, dir).collect().map(_.toString)
    }
    assert(rewritten.sameElements(plain))
  }

  test("round-3 top-k queries all run on the operator and match their plain results") {
    val dir = "/root/testdata/sf0.001"
    // log compaction (argmax per key), weighted sampling (per-source top-k),
    // inverted-index postings (per-token top-k) — each must rewrite AND be
    // result-identical to the window formulation it replaces
    Seq("q93_log_compaction", "q77_weighted_sample", "q74_inverted_index").foreach { name =>
      val plain = SparkEntry.queries(name)(spark, dir).collect().map(_.toString)
      val (p, rewritten) = withTopK {
        val df = SparkEntry.queries(name)(spark, dir)
        (df.queryExecution.executedPlan.toString, df.collect().map(_.toString))
      }
      assert(p.contains("GraftTopKPerKey"), s"$name not rewritten:\n" + p.take(1200))
      assert(rewritten.sameElements(plain), s"$name results diverge under the operator")
    }
  }
}
