package graft

import graft.operators.CurationPipeline
import graft.operators.CurationPipeline.GateStage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-scan curation funnel: drops attribute to the FIRST failing
  * gate, funnel rows telescope exactly, the kept frame matches the
  * conjunction of all gates, and the dedup stage agrees with q30. */
class CurationPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("synthetic corpus: first-failing attribution and telescoping funnel") {
    // doc 1: clean; doc 2: exact dup of 1 AND too short — must charge the
    // dup gate (first in order); doc 3: too short; doc 4: repetitive;
    // doc 5: declared de but obviously en
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again", "en"),
      (2L, "the quick brown fox jumps over the lazy dog again", "en"),
      (3L, "tiny doc", "en"),
      (4L, "spam spam spam spam spam spam spam spam spam spam", "en"),
      (5L, "the cat and the dog and the bird and the fish", "de"))
      .toDF("doc_id", "text", "lang")
    val res = CurationPipeline.run(docs)

    val attribution = res.annotated.select("doc_id", "drop_stage").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(attribution(1L).isEmpty)
    assert(attribution(2L).contains("exact_dup")) // not "too_short": first-failing
    assert(attribution(3L).contains("too_short"))
    assert(attribution(4L).contains("repetitive"))
    assert(attribution(5L).contains("lang_mismatch"))

    assert(res.kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(res.kept.columns.toSeq == Seq("doc_id", "text", "lang")) // gates dropped

    val funnel = res.funnel.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(funnel.map(_._1).toSeq ==
      Seq("exact_dup", "too_short", "repetitive", "lang_mismatch", "kept"))
    // telescoping: each stage's n_out is the next stage's n_in; drops sum to total
    funnel.sliding(2).foreach { case Array(a, b) => assert(a._4 == b._2) }
    assert(funnel.head._2 == 5L && funnel.last._4 == 1L)
    assert(funnel.map(_._3).sum == 4L)
  }

  test("testdata corpus: dedup drops equal q30's removable_dups; kept passes every gate") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val res = CurationPipeline.run(docs)
    val funnel = res.funnel.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // stage 1 sees the whole corpus and its drops are exactly q30's count
    val q30 = SparkEntry.queries("q30_dedup_exact")(spark, dir).collect()(0)
    assert(funnel("exact_dup")._1 == q30.getLong(1)) // total_docs
    assert(funnel("exact_dup")._2 == q30.getLong(2)) // removable_dups

    // every kept doc passes every gate when re-checked independently
    val keptAnnotated = res.annotated.filter(col("drop_stage").isNull)
    val gateCols = res.annotated.columns.filter(_.startsWith("keep_"))
    val allPass = keptAnnotated
      .filter(gateCols.map(c => !col(c)).reduce(_ || _)).count()
    assert(allPass == 0L)
    assert(res.kept.count() == funnel("kept")._3)
  }

  test("null text or lang cannot slip through a gate") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, null.asInstanceOf[String], "en"), // null text
      (3L, "the quick brown fox jumps over the hazy dog", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    val res = CurationPipeline.run(docs)
    val kept = res.kept.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"null-field docs must not survive, kept=$kept")
    // and the funnel still telescopes over them
    val funnel = res.funnel.collect()
    assert(funnel.head.getLong(1) == 3L && funnel.last.getLong(3) == 1L)
  }

  test("memorization gate drops exactly the docs the q125 audit flags") {
    // docs 1 and 2 share a 12-token verbatim span (an 8-position dup run);
    // docs 3 and 4 share only a 5-gram (run 1 — under the threshold);
    // doc 5 is clean. Distinct numeric suffixes keep other grams unique.
    val span = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, s"one1 two1 three1 four1 $span five1 six1", "en"),
      (2L, s"one2 two2 three2 four2 $span five2 six2", "en"),
      (3L, "pre3 a b c d e post3 tail3 x3 y3", "en"),
      (4L, "pre4 a b c d e post4 tail4 x4 y4", "en"),
      (5L, "entirely unique words without any shared grams here at all", "en"))
      .toDF("doc_id", "text", "lang")
    val annotated = CurationPipeline.annotateMemorization(docs)
    val runs = annotated.select("doc_id", "longest_dup_run").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(runs(1L) == 8L && runs(2L) == 8L, s"span docs must carry run 8: $runs")
    assert(runs(3L) == 1L && runs(4L) == 1L)
    assert(runs(5L) == 0L)

    val res = CurationPipeline.run(annotated,
      CurationPipeline.standardStages() :+ CurationPipeline.memorizedStage())
    val attribution = res.annotated.select("doc_id", "drop_stage").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(attribution(1L).contains("memorized"))
    assert(attribution(2L).contains("memorized"))
    assert(attribution(3L).isEmpty && attribution(4L).isEmpty && attribution(5L).isEmpty)
  }

  test("learned quality gate drops exactly what the trained model rejects") {
    // 20-token+ docs are rule-positive, short docs rule-negative; train on
    // a corpus where that's the only separator, then gate a fresh frame —
    // the perceptron must have learned the token boundary well enough to
    // split these far-from-boundary cases, and gate ≡ model by predicate.
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = "a b c"
    val trainDocs = (1L to 60L).map { i =>
      (i, if (i % 5 == 0) short + s" s$i" else long + s" t$i", "en")
    }.toDF("doc_id", "text", "lang")
    val w = CurationPipeline.trainQualityFilter(trainDocs)
    val gateDocs = Seq(
      (101L, long, "en"),           // clearly positive
      (102L, "tiny doc here", "en") // clearly negative (3 tokens)
    ).toDF("doc_id", "text", "lang")
    val res = CurationPipeline.run(gateDocs, Seq(CurationPipeline.learnedQualityStage(w)))
    val attribution = res.annotated.select("doc_id", "drop_stage").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(attribution(101L).isEmpty, s"long doc must pass: w=${w.toSeq}")
    assert(attribution(102L).contains("learned_quality"), s"short doc must drop: w=${w.toSeq}")
  }

  test("custom stages compose and order decides attribution") {
    val docs = Seq((1L, "aa bb cc dd ee ff", "en")).toDF("doc_id", "text", "lang")
    val failBoth = Seq(
      GateStage("first", _ => lit(false)),
      GateStage("second", _ => lit(false)))
    val res = CurationPipeline.run(docs, failBoth)
    assert(res.annotated.select("drop_stage").as[String].collect().toSeq == Seq("first"))
    val reversed = CurationPipeline.run(docs, failBoth.reverse)
    assert(reversed.annotated.select("drop_stage").as[String].collect().toSeq == Seq("second"))
  }
}
