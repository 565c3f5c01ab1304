package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the plans we designed for 100 TB must
  * stay the plans Catalyst actually picks — filters/projection pushed into
  * the parquet scan, dimension joins broadcast, bucketed joins shuffle-free,
  * top-n via TakeOrderedAndProject. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // the production sessions (RunOne/Bench/Verify/Explain) all register
      // the Graft extensions; plan locks must test THOSE plans, not the
      // un-rewritten ones a vanilla session would produce
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // the test JVM shares one session across suites: if another suite built
    // it first, the static `spark.sql.extensions` conf above was ignored —
    // inject the plan-shaping pieces post-hoc (idempotent: the rewrite
    // doesn't match an already-rewritten plan, and a duplicate strategy
    // returns the same physical plan)
    if (!s.experimental.extraOptimizations.contains(graft.plans.RewriteWindowTopK)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.RewriteWindowTopK
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ graft.plans.TopKStrategy
    }
    s
  }

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q20 pushes the shipdate filter and prunes columns at the scan") {
    val p = plan("q20_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // only the 7 needed columns are read, not the full 11-column schema
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_orderkey"), "projection not pruned:\n" + p.take(2000))
  }

  test("q21 broadcasts the dimension side and uses TakeOrderedAndProject for top-n") {
    val p = plan("q21_top_customers")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "unexpected sort-merge join")
  }

  test("q02 routing stays in whole-stage codegen with a single aggregation shuffle") {
    val df = SparkEntry.queries("q02_route_destinations")(spark, dir)
    df.collect() // materialize with AQE final plan
    val p = df.queryExecution.executedPlan.toString
    // AQE plan strings mark codegen stages as "*(n)"
    assert(p.contains("*("), "no whole-stage codegen stages:\n" + p.take(1500))
    // one shuffle for the groupBy + one for the output sort — nothing else
    // (AQE shows each exchange twice: once in the final plan, once cached)
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(p).size
    assert(exchanges <= 4, s"too many exchanges ($exchanges):\n" + p.take(2000))
  }

  test("bucketed co-located join runs without any shuffle") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val or = spark.read.parquet(s"$dir/orders.parquet")
    // the suite may inherit a session whose warehouse dir carries leftovers
    // from an earlier run; clear both catalog entries and locations
    Seq("li_bucketed", "or_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (loc.exists()) rm(loc)
    }
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    or.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("or_bucketed")
    // force the shuffle-based join path so bucketing is what avoids it
    // (at this tiny SF AQE would otherwise broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("or_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(1200))
      // the join itself must not shuffle: both sides pre-bucketed on the key
      val exchangesOnJoinKey = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findAllIn(p).size
      assert(exchangesOnJoinKey == 0,
        "bucketed join still shuffles on the join key:\n" + p.take(2500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q42 runs without any window operator (no global sort of the corpus)") {
    val p = plan("q42_simhash")
    assert(!p.contains("Window"), "global window crept back into q42:\n" + p.take(1500))
  }

  test("q47 candidate generation is an equi-join on (band, bucket), never all-pairs") {
    val p = plan("q47_embed_neardup")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), "non-equi join in candidate generation:\n" + p.take(1500))
    assert(p.contains("band"), p.take(800))
  }

  test("q49 frame explode is partition-parallel (Generate, no pre-shuffle)") {
    val df = SparkEntry.queries("q49_frame_sample")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Generate"), p.take(1200))
    // the only exchange is the final aggregation, after the explode
    val genIdx = p.indexOf("Generate")
    assert(!p.substring(genIdx).contains("Exchange hashpartitioning(media_id"),
      "frames shuffled by media before aggregation:\n" + p.take(2000))
  }

  test("partition-pruned scan: a topic filter reads only that topic's files") {
    val base = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.Tables.events(spark, dir)
      .write.mode("overwrite").partitionBy("event_type").parquet(base)
    val q = spark.read.parquet(base).filter(col("event_type") === "click")
      .groupBy("user_id").count()
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      "partition filter not pushed to the scan:\n" + p.take(1500))
    // the pruned predicate must NOT appear as a post-scan data filter
    assert(!p.contains("PushedFilters: [IsNotNull(event_type)"),
      "event_type read as a data column instead of a partition:\n" + p.take(1500))
  }

  test("AQE splits a skewed join instead of letting one task carry the hot key") {
    // the session is shared across suites: snapshot every conf this test
    // touches and restore ALL of them, or later plan-shape tests inherit
    // 8KB advisory partitions and force-split joins
    val touched = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val prev = touched.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // the join feeds an aggregation that re-shuffles anyway; without force,
    // the skew rule refuses any split that would add an exchange
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try {
      import spark.implicits._
      // 200k rows on one hot key vs 50 keys of 10 rows; incompressible
      // payload so the hot shuffle partition's bytes actually show the skew
      val skewed = spark.range(200000)
        .select(lit(0L).as("k"), expr("xxhash64(id)").as("payload"))
        .union(spark.range(500)
          .select((col("id") % 50 + 1).as("k"), expr("xxhash64(id)").as("payload")))
      val dim = spark.range(51).select(col("id").as("k"), (col("id") * 2).as("v"))
      val j = skewed.join(dim, "k").groupBy("v").count()
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), "AQE did not split the skewed partition:\n" + p.take(2000))
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("q52 range join plans as an equi-join on buckets, not a nested loop") {
    val p = plan("q52_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join fell back to a nested loop:\n" + p.take(1500))
    assert(p.contains("bucket"), p.take(800))
  }

  test("q41 LSH buckets materialize in one bounded-state aggregation, no cache") {
    // the candidate pipeline (pre-checkpoint): bucket pair generation =
    // ObjectHashAggregate over smallest_k, not a [size-agg ⋈ bands ⋈ bands]
    // self-join over a cached frame
    val candPlan = graft.operators.SimilarityOps
      .q41Candidates(graft.operators.SimilarityOps.q41Buckets(spark, dir))
      .queryExecution.executedPlan.toString
    assert(candPlan.contains("ObjectHashAggregate"), candPlan.take(2000))
    assert(!candPlan.contains("InMemoryTableScan"), "q41 should no longer cache the bands")

    // the full query: candidates come from the checkpointed RDD (computed
    // once, not replayed per reference) and the jaccard verify joins are
    // broadcast, never sort-merge shuffles
    val p = plan("q41_minhash_lsh")
    assert(p.contains("ExistingRDD"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "verify joins should broadcast:\n" + p.take(2000))
  }

  test("q54 decontamination probes the benchmark set with a broadcast semi-join") {
    val p = plan("q54_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(2000))
  }

  test("q86 rank broadcast is gated on node count; over-cap variant matches") {
    import graft.operators.RelationalOps
    // under the cap (the default at any test SF): the per-round rank joins
    // carry the broadcast hint
    val hinted = RelationalOps.q86PageRank(spark, dir)
    // by optimization time the hint is folded into the Join node's JoinHint
    assert(hinted.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      "node count under the cap should hint the rank broadcast")
    // force the gate to trip (cap 0 = every graph is 'too big'): no hint
    // anywhere in the plan — the join strategy is left to the engine, which
    // may still AQE-promote at runtime when the actual size allows (that
    // runtime gate is the point)
    val shuffled = RelationalOps.q86PageRank(spark, dir, broadcastNodeCap = 0L)
    assert(!shuffled.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      "over-cap run must not hint a broadcast of the rank table")
    // and the fallback is not a different algorithm: identical rows
    val a = hinted.collect().map(_.toSeq)
    val b = shuffled.collect().map(_.toSeq)
    assert(a.sameElements(b), "gated and ungated variants must agree")
  }

  test("the committed plan dump covers exactly the current query set") {
    // the whole-suite plan audit trail must track the query surface: a
    // query added without a plan dump — or a dump left from an older
    // surface — fails here rather than silently going stale
    import scala.jdk.CollectionConverters._
    val docs = java.nio.file.Paths.get("docs")
    assert(java.nio.file.Files.isDirectory(docs), s"docs/ not found from ${System.getProperty("user.dir")}")
    val dumps = java.nio.file.Files.list(docs).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("plans_r\\d+\\.txt")).toSeq
    val latest = dumps.maxByOption(n => "\\d+".r.findFirstIn(n).get.toInt)
    assert(latest.isDefined, "no docs/plans_rN.txt plan dump committed")
    val content = java.nio.file.Files.readString(docs.resolve(latest.get))
    val dumped = "================ (\\S+) ================".r
      .findAllMatchIn(content).map(_.group(1)).toSet
    val current = SparkEntry.queries.keySet
    assert(dumped == current,
      s"plan dump ${latest.get} is stale — missing=${(current -- dumped).toSeq.sorted}, " +
        s"extra=${(dumped -- current).toSeq.sorted}; regenerate with " +
        "sbt 'runMain graft.Explain /root/testdata/sf0.001 docs/plans_rN.txt'")
    assert(!content.contains("ERROR:"),
      s"plan dump ${latest.get} contains failed explains — regenerate")
  }

  test("no query plans a CartesianProduct; nested-loop joins stay on the bounded whitelist") {
    // suite-wide scale-killer sweep over the committed plan dump (kept in
    // sync with the query surface by the test above): a CartesianProduct
    // anywhere is an instant fail — at 100 TB it is a corpus² explosion.
    // BroadcastNestedLoopJoin is tolerated ONLY where one side is provably
    // tiny by construction (a 1-row scalar aggregate, a <=10-vector query
    // set, a bounded head set) — growing this list is a design decision,
    // not a merge accident.
    val bnljBounded = Set(
      "q37_tfidf", "q75_pmi_collocations", "q76_bm25", // 1-row corpus totals
      "q126_hybrid_rrf", // 1-row corpus total inside the shared q76 scorer
      "q84_funnel", "q94_benford_audit", // 1-row scalars
      "q101_join_cardinality", "q108_token_budget", // 1-row sketch/budget scalars
      "q113_ivf_maintenance", "q115_mixture_weights", // 1-row totals over K cells / sources
      "q172_daily_increment", // the same 1-row cell-totals attach (q113's shape, stage C)
      "q130_source_divergence", "q131_epoch_plan", // 1-row corpus-total scalars
      "q165_epoch_exec", // 1-row corpus-total scalars inside the embedded q131 plan
      "q166_materialize_manifest", // same embedded q131 totals as q165
      "q167_curated_materialize", // 1-row curated-totals attach (the q131 shape on q164's output)
      "q133_vocab_coverage", // 6-row k-budget literal + 1-row totals
      "q40_ann_cosine", "q72_ann_recall", "q97_ann_mrr", // <=10-vector query sets
      "q148_ivf_probe_sweep", "q149_probe_plan", // <=10-vector query set (exact ground-truth leg)
      "q150_ivfpq_recall", "q152_ivfpq_residual", // <=10-vector query set (exact ground-truth leg)
      "q153_ivfpq_refine", "q156_ivfpq_resid_refine", // <=10-vector query set (exact ground-truth leg)
      "q154_lsh_band_sweep", // 1-row truth-total scalar attach
      "q155_dedup_policy", // two 1-row scalar attaches over the <=9-row policy table
      "q151_dsir_resample", // 1-row totals over the <=B-bucket table (q124's shape)
      "q42_simhash", // 100-row head set theta-join
      "q122_semantic_decon", // benchmark suite side is small by nature (broadcast eval set)
      "q124_dsir_weights", // 1-row totals over the <=B-bucket table
      "q164_curation_exec", // 1-row DSIR totals over the <=B-bucket table (q124's shape)
      "q138_novelty_decay", // 1-row max-doc-id scalar for the batch id
      "q145_range_boundaries") // <=R-1-row target/boundary broadcasts + 1-row sample total
    import scala.jdk.CollectionConverters._
    val docs = java.nio.file.Paths.get("docs")
    val latest = java.nio.file.Files.list(docs).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("plans_r\\d+\\.txt"))
      .maxBy(n => "\\d+".r.findFirstIn(n).get.toInt)
    val content = java.nio.file.Files.readString(docs.resolve(latest))
    val sections = content.split("================ ").toSeq.drop(1)
    assert(sections.nonEmpty)
    sections.foreach { s =>
      val name = s.takeWhile(_ != ' ')
      assert(!s.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      if (s.contains("BroadcastNestedLoopJoin"))
        assert(bnljBounded.contains(name),
          s"$name grew a BroadcastNestedLoopJoin outside the bounded whitelist")
    }
  }

  test("q86 over-cap rounds never re-shuffle the edge table (pre-partitioned checkpoints)") {
    import graft.operators.RelationalOps
    import org.apache.spark.sql.execution.RDDScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    // cap 0 forces the shuffle-join path: each round's two legs must consume
    // the halfC/halfS checkpoints' persisted hashpartitioning — the only
    // exchanges over an edge-scan subtree are the inflow aggregation on dst
    // (and post-limit 20-row bookkeeping), NEVER hashpartitioning(cust/supp)
    val shuffled = RelationalOps.q86PageRank(spark, dir, broadcastNodeCap = 0L,
      releaseCaches = false)
    // AQE wraps the physical plan; unwrap to traverse the real operators
    val plan = shuffled.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def isEdgeScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.children.isEmpty && p.output.exists(a => a.name == "degc" || a.name == "degs")
    // the cached copies surface their partitioning to the planner
    val edgeScans = plan.collect { case r if isEdgeScan(r) => r }
    assert(edgeScans.nonEmpty, "no edge checkpoint scans in the final-round plan:\n" + plan.toString.take(2000))
    assert(edgeScans.exists(_.outputPartitioning.isInstanceOf[HashPartitioning]),
      "edge checkpoints lost their hashpartitioning:\n" + edgeScans.map(_.outputPartitioning).mkString(", "))
    val offenders = plan.collect {
      case ex: ShuffleExchangeExec
        if ex.collectLeaves().exists(isEdgeScan) &&
          Seq("cust", "supp").exists(k => ex.outputPartitioning.toString.contains(k)) => ex
    }
    assert(offenders.isEmpty,
      "an edge-sized subtree is re-exchanged on a join key:\n" + offenders.mkString("\n").take(2000))
  }

  test("q124 tokenizes the corpus once (single documents scan feeds histogram and scoring)") {
    val df = SparkEntry.queries("q124_dsir_weights")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the exploded bucket projection is checkpointed: the final plan reads
    // the RDD twice but the parquet tokenize scan ran ONCE at build time
    val fileScans = "Scan parquet".r.findAllIn(p).size
    assert(fileScans == 0,
      s"q124 final plan re-reads documents.parquet ($fileScans file scans) — " +
        "the tokenized projection is no longer materialized:\n" + p.take(2000))
    assert(p.contains("Scan ExistingRDD"), "expected the checkpointed token projection:\n" + p.take(1500))
  }

  test("round-8 heavy queries keep their scale shapes (q114/q117/q126/q132/q135)") {
    // q114/q117: the gram/span aggregate materializes ONCE — the final
    // plan consumes the checkpointed projection, never re-scanning (and
    // re-exploding) documents.parquet per consumer
    for (q <- Seq("q114_ngram_dup_profile", "q117_source_overlap")) {
      val p = plan(q)
      assert(p.contains("Scan ExistingRDD"),
        s"$q no longer materializes its gram aggregate:\n" + p.take(1500))
      assert(!"Scan parquet .*documents".r.findFirstIn(p).isDefined,
        s"$q re-scans documents per consumer:\n" + p.take(2500))
    }
    // q135 (un-checkpointed): the chunk/gram explode (Generate) runs
    // partition-parallel directly over the scan — at least one explode has
    // NO exchange anywhere below it (docs are never pre-shuffled to explode)
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    locally {
      val plan0 = SparkEntry.queries("q135_winnow_pairs")(spark, dir).queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val gens = plan0.collect { case g: GenerateExec => g }
      assert(gens.nonEmpty, "q135 lost its Generate:\n" + plan0.toString.take(1200))
      assert(gens.exists(g => g.collect { case e: ShuffleExchangeExec => e }.isEmpty),
        "q135: every explode sits above a shuffle — the gram explode is no " +
          "longer scan-adjacent:\n" + plan0.toString.take(2500))
    }
    // q126: both retrieval legs collapse to bounded top-k heaps before fusion
    val p126 = plan("q126_hybrid_rrf")
    assert("TakeOrderedAndProject".r.findAllIn(p126).size >= 2,
      "q126 fusion legs are not heap-bounded:\n" + p126.take(2500))
    // q132: the benchmark n-gram side broadcasts into the corpus probe
    val p132 = plan("q132_bench_leaks")
    assert(p132.contains("BroadcastHashJoin"),
      "q132 bench side no longer broadcasts:\n" + p132.take(2500))
    // q135: the pair explode sits ABOVE the capped bucket aggregate — fanout
    // is bounded by cap² per fingerprint, never corpus-sized
    val p135 = plan("q135_winnow_pairs")
    val aggIdx = "(?i)smallestk".r.findFirstMatchIn(p135).map(_.start).getOrElse(-1)
    assert(aggIdx >= 0, "q135 lost its SmallestK bucket cap:\n" + p135.take(1500))
    assert(p135.take(aggIdx).contains("Generate"),
      "q135 pair explode is not above the capped bucket aggregate:\n" + p135.take(2500))
  }

  test("round-9 tail queries keep their scale shapes (q140/q141)") {
    // q140: the quantized dim projection materializes ONCE (embeddings
    // scanned at build time, both consumers read the checkpoint) and the
    // L-row centroid table BROADCASTS into the dim probe — the distance
    // computation must never plan a sort-merge join of two |V|·d tables
    val p140 = plan("q140_label_purity")
    assert("Scan parquet".r.findAllIn(p140).isEmpty,
      "q140 re-scans embeddings per consumer — the quantized dim " +
        "projection is no longer materialized:\n" + p140.take(2000))
    assert(p140.contains("Scan ExistingRDD"),
      "expected the checkpointed dim projection:\n" + p140.take(1500))
    // the distance join itself runs at checkpoint-build time; inspect the
    // full un-materialized lineage for the centroid broadcast
    val p140full = graft.operators.SimilarityOps
      .q140LabelPurity(spark, dir, materialize = false)
      .queryExecution.executedPlan.toString
    assert(p140full.contains("BroadcastHashJoin"),
      "q140 centroids no longer broadcast into the dim probe:\n" + p140full.take(2500))
    // q141: one events scan; the session window's hashpartitioning(user_id)
    // must be REUSED by the (user_id, session_idx) aggregation — the only
    // exchanges are that window shuffle and the final output sort
    val p141 = plan("q141_session_docs")
    assert("Scan parquet".r.findAllIn(p141).size == 1,
      "q141 should read events exactly once:\n" + p141.take(2000))
    val ex141 = "Exchange (hash|range)partitioning".r.findAllIn(p141).size
    assert(ex141 <= 2,
      s"q141 grew extra exchanges ($ex141) — the session aggregation no " +
        "longer reuses the window's user_id partitioning:\n" + p141.take(2500))
  }

  test("q146 audits the stored PQ codes alone — no vectors, no training subtree") {
    // since r16 the audit reads the PERSISTED compressed index: the codes
    // artifact carries per-subspace d2 + energy, so the plan is the
    // artifact scan + the broadcast label join rolled up to L rows —
    // exactly two parquet scans (codes, labels), zero Scan ExistingRDD
    // (no training checkpoint), never a shuffle join of vector-sized
    // tables
    val p = plan("q146_pq_distortion")
    assert(!p.contains("Scan ExistingRDD"),
      "q146 regressed to a training-checkpoint scan:\n" + p.take(2000))
    assert(p.contains("pq_full_"),
      "q146 no longer reads the stored PQ artifact:\n" + p.take(2000))
    assert("Scan parquet".r.findAllIn(p).size == 2,
      "q146 should scan parquet exactly twice (codes + labels):\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "q146 label join no longer broadcasts:\n" + p.take(2500))
    assert(!p.contains("SortMergeJoin"),
      "q146 plans a shuffle join of vector-sized tables:\n" + p.take(2500))
  }

  test("q147 legs are heap-bounded top-k over broadcast probes of the stored PQ model") {
    // both legs serve from the PERSISTED model since r16: the ADC leg
    // joins the codes artifact to broadcast distance tables built from
    // the stored books; the exact ground-truth leg re-derives subvectors
    // from the embeddings scan (its point is exact distances). No
    // training subtree anywhere; per-query rank lists cap via the
    // TopKPerKey rewrite (map-side bounded heaps) — never a full
    // per-query window sort of corpus-sized distance lists
    val p = plan("q147_pq_recall")
    assert(!p.contains("Scan ExistingRDD"),
      "q147 regressed to a training-checkpoint scan:\n" + p.take(2000))
    assert(p.contains("pq_full_"),
      "q147 no longer reads the stored PQ artifact:\n" + p.take(2000))
    assert("GraftTopKPerKey\\(final\\)".r.findAllIn(p).size == 2,
      "q147 legs lost the bounded-heap top-k rewrite:\n" + p.take(2500))
    assert(p.contains("BroadcastHashJoin"),
      "q147 probe sides no longer broadcast:\n" + p.take(2500))
  }

  test("q137 tokenizes once and explodes pairs only above the capped bucket aggregate") {
    // the shingle table must materialize ONCE (r9's plan re-ran the
    // tokenize+explode+distinct from parquet for each of its three
    // consumers — the steepest 10× slope of that round), and the pair
    // explode must sit ABOVE the SmallestK bucket cap so fanout is
    // ≤ cap² per shingle, never corpus-sized
    val p = plan("q137_containment_pairs")
    assert("Scan parquet".r.findAllIn(p).isEmpty,
      "q137 re-scans documents.parquet — the shingle table is no longer " +
        "materialized:\n" + p.take(2000))
    assert(p.contains("Scan ExistingRDD"),
      "expected the checkpointed shingle table:\n" + p.take(1500))
    val aggIdx = "(?i)smallestk".r.findFirstMatchIn(p).map(_.start).getOrElse(-1)
    assert(aggIdx >= 0, "q137 lost its SmallestK bucket cap:\n" + p.take(1500))
    assert(p.take(aggIdx).contains("Generate"),
      "q137 pair explode is not above the capped bucket aggregate:\n" + p.take(2500))
    assert(p.contains("TakeOrderedAndProject"),
      "q137 top-n is not heap-based:\n" + p.take(2000))
    // q138 had the same disease (both the first-seen and per-batch legs
    // re-ran the gram explode from parquet): its (digest, batch) presence
    // set must materialize once too
    val p138 = plan("q138_novelty_decay")
    assert("Scan parquet".r.findAllIn(p138).isEmpty,
      "q138 re-scans documents.parquet — the presence set is no longer " +
        "materialized:\n" + p138.take(2000))
    assert(p138.contains("Scan ExistingRDD"),
      "expected the checkpointed presence set:\n" + p138.take(1500))
  }

  test("q72 serving-path eval: probes broadcast, both top-k legs are bounded heaps") {
    // the rebuilt q72 (recall per nprobe through the productized
    // ivfProbes path) must keep the q148 shape: the probe table and the
    // bounded query set BROADCAST (one nested-loop join only — the
    // whitelisted exact ground-truth leg), and both per-key rank filters
    // rewrite to the two-phase bounded-heap operator so nothing
    // corpus-sized is window-sorted per query
    val p = plan("q72_ann_recall")
    assert(p.contains("BroadcastHashJoin"),
      "q72 probe table no longer broadcasts into the index:\n" + p.take(2500))
    // at least TWO bounded heaps — the per-(nprobe, qid) IVF leg and the
    // per-qid exact leg (the corpus-sized rank lists). The ivfProbes
    // crank ranking over the 10-query frame makes a third when its
    // literal cap survives to the rewrite un-merged; depending on which
    // suite built the shared session, filter-combining may fold it into
    // the non-literal explode filter first — harmless at 10 rows, so the
    // lock pins only the corpus-sized legs
    assert("GraftTopKPerKey\\(final\\)".r.findAllIn(p).size >= 2,
      "q72 legs lost the bounded-heap top-k rewrite:\n" + p.take(2500))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      "q72 grew a second nested-loop join:\n" + p.take(2500))
  }

  test("q148 probe sweep broadcasts the probe table; scan counts come from the cell-size table") {
    // the sweep's scan cost must grow with Σ probed cell sizes, never
    // corpus²: the ≤70-row probe table (10 queries × Σ{1,2,4} breadths)
    // BROADCASTS into one equi-join against the index, the K-row
    // cell-size table broadcasts into the count rollup, and the only
    // permitted nested-loop join is the exact ground-truth leg's bounded
    // ≤10-query crossJoin (whitelisted suite-wide)
    val p = plan("q148_ivf_probe_sweep")
    assert(!p.contains("CartesianProduct"), "q148 plans a corpus² join:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "q148 probe table no longer broadcasts into the index:\n" + p.take(2500))
    // the IVF candidate scan is an equi-join on the probed cell id
    assert(p.contains("pcid"), "probe-cell equi-join key missing:\n" + p.take(1500))
    // at most one BNLJ: the bounded exact-leg crossJoin — a second one
    // means the probe or count side regressed to a nested loop
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"q148 grew $bnlj nested-loop joins:\n" + p.take(2500))
  }

  test("q150 IVF-PQ eval: probe and distance tables broadcast, candidates stay equi-joined") {
    // the combined index must keep BOTH structures' scale shapes at once:
    // the ≤20-row probe table broadcasts into the postings equi-join on
    // pcid (coarse pruning never corpus²), the per-query ADC distance
    // tables broadcast into the code equi-join, both rank legs rewrite to
    // bounded heaps, and the only nested-loop join is the whitelisted
    // exact ground-truth leg
    val p = plan("q150_ivfpq_recall")
    assert(!p.contains("CartesianProduct"), "q150 plans a corpus² join:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "q150 lost its broadcast joins:\n" + p.take(2500))
    assert(p.contains("pcid"), "probe-cell equi-join key missing:\n" + p.take(1500))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"q150 grew $bnlj nested-loop joins:\n" + p.take(2500))
    assert("GraftTopKPerKey\\(final\\)".r.findAllIn(p).size >= 2,
      "q150 rank legs lost the bounded-heap top-k rewrite:\n" + p.take(2500))
  }

  test("q153 refined IVF-PQ: shortlist broadcasts into the vector fetch, three bounded heaps") {
    // the refine stage adds a third rank leg (the exact re-rank of the
    // shortlist) and one more broadcast (the ≤ queries×3k shortlist into
    // the stored-vector fetch) — it must NOT add a second corpus pass or
    // a nested-loop join beyond the whitelisted exact ground-truth leg
    val p = plan("q153_ivfpq_refine")
    assert(!p.contains("CartesianProduct"), "q153 plans a corpus² join:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "q153 lost its broadcast joins:\n" + p.take(2500))
    assert(p.contains("pcid"), "probe-cell equi-join key missing:\n" + p.take(1500))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"q153 grew $bnlj nested-loop joins:\n" + p.take(2500))
    assert("GraftTopKPerKey\\(final\\)".r.findAllIn(p).size >= 3,
      "q153 rank legs (ADC shortlist, refine, exact) lost the bounded-heap rewrite:\n" + p.take(2500))
  }

  test("q157 removal execution: three corpus scans, no cartesian, map-only rebuild") {
    // the span side is q128's dup-run machinery, whose gram-position frame
    // is deliberately consumed twice (repeated-digest aggregation + dup
    // semi-join — re-scanning beats materializing the position explode);
    // the reconstruction adds exactly one more scan joined against the
    // doc-keyed interval lists. The execution must not add a fourth scan
    // or any nested-loop/cartesian join (the rebuild is a per-row filter)
    val df = SparkEntry.queries("q157_substring_removal_exec")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q157 plans a corpus-squared join:\n" + p.take(2000))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 3, s"q157 scans the corpus $scans times:\n" + p.take(2000))
  }

  test("q154 banding sweep: zero corpus scans above the checkpointed verdict") {
    // the three bandings, their candidate union, AND the pair verdict are
    // all materialized behind localCheckpoints — the FINAL plan is rollup
    // arithmetic over RDD scans: no parquet re-scan may survive (the truth
    // scalar would otherwise replay the whole shingle-verify subtree)
    val df = SparkEntry.queries("q154_lsh_band_sweep")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "q154 plans a corpus² join:\n" + p.take(2000))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 0,
      s"q154 re-scans parquet $scans times above the checkpointed verdict:\n" + p.take(2000))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"q154 grew $bnlj nested-loop joins:\n" + p.take(2500))
    assert(p.contains("Scan ExistingRDD"),
      "expected the checkpointed candidate union:\n" + p.take(1500))
  }

  test("q156 refined residual IVF-PQ: shortlist broadcasts, three bounded heaps") {
    // q153's refine lock applied to the residual encoding: one more
    // broadcast (the shortlist into the vector fetch), a third rank leg,
    // still no corpus² and only the whitelisted exact ground-truth BNLJ
    val p = plan("q156_ivfpq_resid_refine")
    assert(!p.contains("CartesianProduct"), "q156 plans a corpus² join:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "q156 lost its broadcast joins:\n" + p.take(2500))
    assert(p.contains("pcid"), "probe-cell equi-join key missing:\n" + p.take(1500))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"q156 grew $bnlj nested-loop joins:\n" + p.take(2500))
    assert("GraftTopKPerKey\\(final\\)".r.findAllIn(p).size >= 3,
      "q156 rank legs (ADC shortlist, refine, exact) lost the bounded-heap rewrite:\n" + p.take(2500))
  }

  test("q152 residual IVF-PQ keeps q150's shapes with per-cell distance tables") {
    // residual encoding changes the distance-table grain to (query, probed
    // cell) but must NOT change the scale skeleton: probe + distance
    // tables broadcast, candidates equi-joined, one whitelisted
    // nested-loop join (the exact leg), both rank legs bounded heaps
    val p = plan("q152_ivfpq_residual")
    assert(!p.contains("CartesianProduct"), "q152 plans a corpus² join:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "q152 lost its broadcast joins:\n" + p.take(2500))
    assert(p.contains("pcid"), "probe-cell equi-join key missing:\n" + p.take(1500))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"q152 grew $bnlj nested-loop joins:\n" + p.take(2500))
    assert("GraftTopKPerKey\\(final\\)".r.findAllIn(p).size >= 2,
      "q152 rank legs lost the bounded-heap top-k rewrite:\n" + p.take(2500))
  }

  test("q151 resample keeps q124's single-tokenize shape (one documents scan)") {
    // the resample execution inherits q124's dataflow: the tokenized
    // bucket projection materializes ONCE (localCheckpoint) and feeds both
    // the class histogram and the per-doc scoring join — the corpus scan
    // count must not regress to two when the gate+rollup stage is added
    val df = SparkEntry.queries("q151_dsir_resample")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 0,
      s"q151 re-scans parquet $scans times — the checkpointed projection is gone:\n" + p.take(2000))
    assert(p.contains("Scan ExistingRDD"),
      "expected the checkpointed token projection:\n" + p.take(1500))
  }

  test("q158 removal is pair-bounded: no corpus², broadcast-gated rebuild") {
    // the LSH chain is checkpointed away (Scan ExistingRDD); what remains
    // must be broadcast hash joins of pair-sized slivers into corpus
    // passes — never a cartesian/nested-loop join, and the canonical
    // window keyed by comp (active sliver only), not over documents
    val p = plan("q158_neardup_removal_exec")
    assert(!p.contains("CartesianProduct"), "q158 plans a corpus² join:\n" + p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "q158 grew a nested-loop join:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "q158 lost its broadcast joins (labels/losers slivers now shuffle):\n" + p.take(2500))
    assert(p.contains("windowspecdefinition(comp#"),
      "q158 canonical window no longer keyed by component:\n" + p.take(2500))
  }

  test("q159 executes through one broadcast of the threshold table") {
    // calibrate-then-execute: the S-row threshold table must BROADCAST
    // into the re-scoring scan (a shuffle join on source would move the
    // corpus); no nested-loop join anywhere
    val p = plan("q159_quality_filter_exec")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q159 plans a non-equi join:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "q159 threshold table no longer broadcasts:\n" + p.take(2500))
    assert("Scan parquet".r.findAllIn(p).size == 2,
      "q159 must scan documents exactly twice (histogram + gate):\n" + p.take(2500))
  }

  test("q160 sweep stays one scan + one window (budget-independent cumulative)") {
    val p = plan("q160_pack_sweep")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "q160 re-scans documents per budget:\n" + p.take(2500))
    assert("windowspecdefinition".r.findAllIn(p).size == 1,
      "q160 grew a second window:\n" + p.take(2500))
    assert(!p.contains("Join"), "q160 should have no join at all:\n" + p.take(2000))
    assert(p.contains("Generate explode"),
      "q160 budget fan-out is not the map-side explode:\n" + p.take(2000))
  }

  test("q161 probes snapshot buckets by equi-join, never corpus²") {
    // the final plan is the flags-join + rollup above the checkpointed
    // verdict (Scan ExistingRDD); the probe itself is asserted on the
    // pre-checkpoint subtree, where the (band, band_sig) key must drive a
    // hash equi-join — a SortMergeJoin is fine at corpus scale, a
    // nested-loop/cartesian never is
    val p = plan("q161_incremental_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q161 plans a non-equi join:\n" + p.take(2000))
    assert(p.contains("InMemoryTableScan") || p.contains("Scan ExistingRDD"),
      "q161 lost its materialized verdict sliver (persist or checkpoint):\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "q161 flags sliver no longer broadcasts:\n" + p.take(2000))
    val sub = graft.operators.SimilarityOps.q161CandidatePairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!sub.contains("CartesianProduct") && !sub.contains("BroadcastNestedLoopJoin"),
      "q161 probe subtree plans a non-equi join:\n" + sub.take(2500))
    assert(sub.contains("band_sig#"),
      "q161 probe no longer keys on (band, band_sig):\n" + sub.take(2500))
  }

  test("q162 manifest is one scan into hash aggregation — no corpus sort") {
    // the first-doc witness is a packed DECIMAL min precisely so the
    // aggregate hash-aggregates; a struct-min would silently flip the
    // whole corpus projection into per-partition SortAggregate sorts
    val p = plan("q162_shuffle_shards")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "q162 re-scans documents:\n" + p.take(2000))
    assert(!p.contains("SortAggregate"),
      "q162 aggregation degraded to SortAggregate (corpus sort):\n" + p.take(2500))
    // the only join is the S-row static shard list padding the manifest
    // (zero-doc shards must surface) — it must broadcast, and the corpus
    // side must still be the single hash-aggregated scan
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "q162 shard-list padding join is not a broadcast equi-join:\n" + p.take(2500))
  }

  test("q163 decon execution: benchmark grams broadcast, flagged ids equi-join") {
    // the audit's scale shape carried into the execution: the tiny
    // benchmark 3-gram side must BROADCAST into a left-semi probe of the
    // corpus gram stream; the flagged-id sliver joins back on doc_id as a
    // hash equi-join; nothing corpus² anywhere
    val p = plan("q163_decon_exec")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q163 plans a non-equi join:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "q163 benchmark gram set no longer broadcasts into a semi-join:\n" + p.take(2500))
    assert(!p.contains("SortAggregate"),
      "q163 rollup degraded to SortAggregate:\n" + p.take(2500))
  }

  test("q164 composed pipeline keeps every stage's broadcast-sliver shape") {
    // the composition must not lose the standalone bridges' scale shapes:
    // no corpus² anywhere (the DSIR 1-row totals attach is the only BNLJ,
    // whitelisted suite-wide); the canonical window stays keyed by
    // component; the threshold/class/benchmark slivers broadcast
    val p = plan("q164_curation_exec")
    assert(!p.contains("CartesianProduct"),
      "q164 plans a corpus² join:\n" + p.take(2500))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "q164 benchmark gram probe lost its broadcast semi-join:\n" + p.take(2500))
    // the stage-1 canonical window lives below the losers checkpoint —
    // assert its shape on the pre-checkpoint accessor (q161's pattern)
    val sub = graft.operators.CurationExec.q164Losers1(spark, dir)
      ._1.queryExecution.executedPlan.toString
    assert(!sub.contains("CartesianProduct"),
      "q164 stage-1 subtree plans a corpus² join:\n" + sub.take(2500))
    assert(sub.contains("windowspecdefinition(comp#"),
      "q164 stage-1 canonical window no longer keyed by component:\n" + sub.take(2500))
  }

  test("q165 epoch execution: plan broadcasts, replica fanout map-side") {
    // the S-row epoch plan must BROADCAST into the corpus scan (a shuffled
    // plan join would re-partition the whole corpus by source — the skew
    // magnet); the replica explode is a Generate with no join under it;
    // the only nested-loop joins are the embedded q131 1-row totals
    val p = plan("q165_epoch_exec")
    assert(!p.contains("CartesianProduct"),
      "q165 plans a corpus² join:\n" + p.take(2500))
    assert(p.contains("BroadcastHashJoin"),
      "q165 epoch plan no longer broadcasts into the corpus scan:\n" + p.take(2500))
    assert(p.contains("Generate explode"),
      "q165 replica fanout is no longer a map-side explode:\n" + p.take(2500))
    assert(!p.contains("SortAggregate"),
      "q165 rollup degraded to SortAggregate:\n" + p.take(2500))
  }

  test("q166 materialization manifest: replica fanout map-side, packed-min hash-aggregates") {
    // the composed manifest keeps both parents' shapes: q165's broadcast
    // plan + map-side replica explode, and q162's packed-DECIMAL witness
    // min on the HashAggregate path (a struct-min would force a
    // SortAggregate corpus sort)
    val p = plan("q166_materialize_manifest")
    assert(!p.contains("CartesianProduct"),
      "q166 plans a corpus² join:\n" + p.take(2500))
    assert(p.contains("BroadcastHashJoin"),
      "q166 epoch plan no longer broadcasts into the corpus scan:\n" + p.take(2500))
    assert(p.contains("Generate explode"),
      "q166 replica fanout is no longer a map-side explode:\n" + p.take(2500))
    assert(!p.contains("SortAggregate"),
      "q166 witness min degraded to SortAggregate:\n" + p.take(2500))
  }

  test("q167 curated materialization keeps the manifest shape over the checkpointed spine") {
    // downstream of the curated checkpoint the plan must be exactly the
    // q166 manifest shape: broadcast plan attach, map-side replica
    // explode, HashAggregate witness min; the q164 spine's own shape is
    // locked by its dedicated test
    val p = plan("q167_curated_materialize")
    assert(!p.contains("CartesianProduct"),
      "q167 plans a corpus² join:\n" + p.take(2500))
    assert(p.contains("Generate explode"),
      "q167 replica fanout is no longer a map-side explode:\n" + p.take(2500))
    assert(!p.contains("SortAggregate"),
      "q167 witness min degraded to SortAggregate:\n" + p.take(2500))
  }

  test("q86/q76 final top-k plans as TakeOrderedAndProject, not a global window sort") {
    // an unpartitioned row_number window filter drags the whole ranked
    // table through ONE task's sort; orderBy().limit(k) plans per-partition
    // bounded heaps + a driver merge of k. The residual Window in these
    // plans runs AFTER the limit, over exactly k rows.
    for (q <- Seq("q86_pagerank", "q76_bm25")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q top-k not heap-based:\n" + p.take(2000))
    }
  }
}
