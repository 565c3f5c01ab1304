package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * q164 — the COMPOSED curation pipeline: the five corpus-rewriting
 * audit→execution bridges (q158 near-dup removal → q157 substring removal
 * → q159 quality filter → q151 DSIR resample → q163 decontamination) run
 * as ONE dataflow over the SAME corpus, in the order a production
 * training-data run applies them. Each stage operates on the PREVIOUS
 * stage's output — span discovery, threshold calibration and the DSIR
 * bucket histogram are all recomputed on their stage input, exactly as a
 * real pipeline recalibrates on the corpus it is about to filter — and
 * the decontamination probe checks the text that actually ships (the
 * stage-2 rewritten bytes) against the ORIGINAL held-out benchmark slice.
 *
 * Output: the per-source funnel — docs and token mass surviving each
 * stage — plus the final corpus fingerprint (bit_xor of surviving docs'
 * 60-bit md5 over their CURRENT bytes: original bytes for untouched docs,
 * rebuilt bytes for stage-2-modified ones — the q157 convention). The
 * funnel HEAD reconciles exactly with the standalone q158 (same pair set,
 * same components, same canonical rule ⇒ same survivors), which
 * QueriesSpec asserts row by row; later stages run on rewritten input by
 * design, so their standalone counterparts are shape oracles, not
 * value equalities.
 *
 * Scale path: every stage keeps its standalone bridge's shape — the LSH
 * chain is banded and bucket-capped (never corpus²), the loser/interval/
 * threshold/class/flag slivers broadcast (size-gated where pair-derived),
 * the DSIR tokenize scan feeds histogram and scoring once, and the
 * benchmark gram set broadcasts into a left-semi probe. The two stage
 * boundaries that change the corpus (after near-dup removal + substring
 * rewrite, and after the quality/resample gates) materialize via
 * localCheckpoint — standing in for the inter-stage parquet writes a
 * production run does; everything between is one declarative plan.
 */
object CurationExec {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** The S0 quality projection shared by stage 1's ranking and the
    * funnel spine. tokens0 counts via the no-allocation kernel instead of
    * size(ws_tokens(...)): lower() is token-count-neutral (no case mapping
    * crosses the whitespace class), so consumers that prune down to
    * tokens0 — the funnel's f0 leg — never build the token array at all;
    * ttr still derives from the array, computed only where a consumer
    * actually reads it (the stage-1 ranking of label-matched docs). */
  private def qualFrame(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("tk", graft.plans.TextKernels.ws_tokens(lower(col("text"))))
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        graft.plans.WsTokenCount.ws_token_count(col("text")).as("tokens0"),
        expr("CASE WHEN size(tk) > 0 THEN CAST(size(array_distinct(tk)) AS BIGINT) * 1000 DIV size(tk) ELSE 0 END")
          .as("ttr"))

  /** Stage 1's pre-checkpoint loser subtree plus the labeling's active
    * bound — graft-visible so PlanSpec can assert the component-keyed
    * canonical window that the checkpoint hides from the final plan
    * (the q161CandidatePairs pattern). `qual` lets the spine pass its
    * materialized quality-metadata sliver so the ttr ranking reads the
    * one tokenize pass instead of re-tokenizing the corpus. */
  private[graft] def q164Losers1(spark: SparkSession, dir: String): (DataFrame, Long) = {
    val dups = SimilarityOps.q41Scored(spark, dir)
      .filter(col("inter") * lit(2L) >= col("uni"))
      .select(col("a").as("ia"), col("b").as("ib"))
    val (labels, activeBound) = SimilarityOps.minLabelComponentsBounded(dups)
    val lab = if (activeBound <= (1L << 20)) broadcast(labels) else labels
    val wc = Window.partitionBy("comp").orderBy(col("ttr").desc, col("doc_id"))
    // restrict to the label-matched docs FIRST, then derive ttr — the join
    // does not commute below the projection on its own, so ranking over
    // qualFrame tokenized + array_distinct'd EVERY doc to rank a sliver
    val losers = docs(spark, dir).select(col("doc_id"), col("text"))
      .join(lab.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .withColumn("tk", graft.plans.TextKernels.ws_tokens(lower(col("text"))))
      .withColumn("ttr",
        expr("CASE WHEN size(tk) > 0 THEN CAST(size(array_distinct(tk)) AS BIGINT) * 1000 DIV size(tk) ELSE 0 END"))
      .withColumn("rk", row_number().over(wc))
      .filter(col("rk") > 1)
      .select(col("doc_id"), lit(1L).as("dropped1"))
    (losers, activeBound)
  }

  /** The composed pipeline's spine: (f0 = every S0 doc with its stage-1
    * verdict, s5 = the stage-5 frame carrying every later verdict and the
    * current bytes' token count/digest). q164's funnel is one rollup over
    * it; q167 consumes the kept5 rows as the curated corpus. Extracted so
    * the materialization composition reuses the EXACT same dataflow.
    *
    * `stageBoundary` materializes the two corpus-rewriting stage outputs
    * (the stage-2 rewritten corpus, the stage-4 gated corpus). The default
    * localCheckpoint is the cheap single-run form; a production run passes
    * a write-parquet-and-reread boundary instead ([[parquetBoundary]]) so
    * an executor loss recomputes from durable inter-stage artifacts rather
    * than failing the job — CurationBoundarySpec proves both modes emit
    * identical funnels and fingerprints. */
  private[graft] def q164Spine(spark: SparkSession, dir: String,
      stageBoundary: DataFrame => DataFrame = _.localCheckpoint()): (DataFrame, DataFrame) = {
    import TextOps.{wsTokenRe, RunThr, NgramW, CalibTargetPermille, DsirBuckets, DsirTargetLang}

    // ---- stage 1: near-dup removal (q158's selection, verbatim) ----
    // (An S0 "materialize the quality metadata once" variant was measured
    // and REVERTED: Catalyst already prunes the tokenize out of the c1 and
    // f0 legs — the losers window computes ttr only on label-matched docs
    // and c1 carries text untouched — so an eager all-docs tokens+distinct
    // checkpoint did strictly more work. Same-host A/B: q164 0.94x.)
    val (losers1Pre, activeBound) = q164Losers1(spark, dir)
    val smallSet = activeBound <= (1L << 20)
    def gated(df: DataFrame): DataFrame = if (smallSet) broadcast(df) else df
    val qual = qualFrame(spark, dir)
    // pair-bounded sliver; its upstream is the whole LSH chain
    val losers1 = graft.Tables.labeled(spark, "q164 spine: stage-1 loser sliver ckpt")(
      losers1Pre.localCheckpoint())
    // every S0 doc with its stage-1 verdict — the funnel's spine
    val f0 = qual.select("doc_id", "source", "lang", "text", "tokens0")
      .join(gated(losers1), Seq("doc_id"), "left_outer")
      .withColumn("kept1", col("dropped1").isNull)
    // stage 2's dup-run rediscovery + rewrite is per-gram/per-token CPU
    // work: spread the survivor frame across the box when the corpus scan
    // under it is smaller than the core count (identity at scale)
    val tinyScan = graft.Tables.fewScanSplits(spark, s"$dir/documents.parquet")
    val c1 = graft.Tables.spreadIfTiny(
      f0.filter(col("kept1")).select("doc_id", "source", "lang", "text"), tinyScan)

    // ---- stage 2: substring removal (q157's rewrite) on the survivors —
    // dup-run spans are REDISCOVERED on the stage-1 corpus: a span whose
    // only other copy was just removed is no longer a dup span
    val iv = TextOps.dupRunSpans(c1, Seq.empty)
      .filter(col("run") >= RunThr)
      .select(col("doc_id"), col("start").as("s"),
        (col("start") + col("run") + lit(NgramW - 2L)).as("e"))
      .groupBy("doc_id").agg(collect_list(struct(col("s"), col("e"))).as("iv"))
    val c2 = c1
      .withColumn("otoks", graft.plans.TextKernels.ws_tokens(col("text")))
      .join(iv, Seq("doc_id"), "left_outer")
      .withColumn("kept", when(col("iv").isNull, col("otoks")).otherwise(expr(
        "transform(filter(sequence(1, size(otoks)), i -> " +
          "NOT exists(iv, l -> i >= l.s AND i <= l.e)), i -> element_at(otoks, i))")))
      .withColumn("text2",
        when(col("iv").isNull, col("text")).otherwise(concat_ws(" ", col("kept"))))
      .select(col("doc_id"), col("source"), col("lang"), col("text2"),
        size(col("kept")).cast("long").as("tokens2"),
        graft.plans.TextKernels.md5_prefix60(col("text2").cast("binary")).as("h2"))
      .transform(df => graft.Tables.labeled(spark, "q164 spine: stage-2 rewrite boundary")(
        stageBoundary(df))) // stage boundary: the rewritten corpus ships downstream

    // ---- stage 3: quality filter (q139's calibration + q159's gate),
    // calibrated on the CURRENT corpus — scores re-derive from the
    // rewritten text, not the original n_chars
    val scored = c2.withColumn("score",
      expr("tokens2 * 1000 DIV greatest(CAST(length(text2) AS BIGINT), 1L)"))
    val hist = scored.groupBy("source", "score").agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("total_docs", sum("c").over(Window.partitionBy("source")))
      .withColumn("accepted", sum("c").over(
        Window.partitionBy("source").orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("accepted") * 1000 >= lit(CalibTargetPermille) * col("total_docs"))
    val thr = cum.withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("score").desc)))
      .filter(col("rn") === 1)
      .select(col("source"), col("score").as("threshold"))
    val s3 = scored.join(broadcast(thr), Seq("source"))
      .withColumn("kept3", col("score") >= col("threshold"))

    // ---- stage 4: DSIR resample (q124's weights through q151's gate),
    // bucket histogram recomputed on the quality-filtered corpus.
    // ONE tokenize scan, reduced map-side to per-(doc, bucket) counts
    // BEFORE anything materializes or shuffles (guide §2.3 "aggregate
    // before you shuffle"): the bucket histogram and the per-doc score
    // both derive from the (doc_id, lang, b, n) frame — strictly fewer
    // rows than the exploded token table the previous formulation
    // checkpointed and re-shuffled twice. Σ_tokens cls ≡ Σ_buckets cls·n.
    val db = graft.Tables.spreadIfTiny(s3.filter(col("kept3")), tinyScan)
      .select(col("doc_id"), col("lang"),
        explode(graft.plans.TextKernels.ws_tokens(lower(col("text2")))).as("tok"))
      .withColumn("b",
        graft.plans.TextKernels.md5_prefix60(col("tok").cast("binary")) % DsirBuckets)
      .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("n"))
      .transform(df => graft.Tables.labeled(spark, "q164 spine: stage-4 doc-bucket ckpt")(
        df.localCheckpoint())) // one tokenize scan feeds histogram AND scoring (q124's move)
    // bucket classes with the totals folded in as an unpartitioned window
    // over the ≤DsirBuckets-row histogram (constant-width at any corpus
    // size) — replaces a checkpointed bucket frame + 1-row totals
    // crossJoin with a single aggregation subtree the perDoc broadcast
    // builds in-job
    val cls = db.groupBy("b")
      .agg(sum("n").as("r_c"),
        sum(when(col("lang") === DsirTargetLang, col("n")).otherwise(0L)).as("t_c"))
      .withColumn("r_tot", sum("r_c").over(Window.partitionBy()))
      .withColumn("t_tot", sum("t_c").over(Window.partitionBy()))
      .select(col("b"),
        (expr("(t_c + 1) * r_tot * 1000 DIV ((r_c + 1) * t_tot)") - 1000L).as("cls"))
    val perDoc = db.join(broadcast(cls), Seq("b"))
      .groupBy("doc_id").agg(sum(col("cls") * col("n")).as("w"))
    // a doc emitting no tokens has no weight row: it carries no target
    // signal, so the resampler drops it (rate 0) — COALESCE'd explicitly
    val s4 = s3.join(perDoc, Seq("doc_id"), "left_outer")
      .withColumn("kept4", col("kept3") &&
        (TextOps.dsirGate(col("doc_id")) <
          greatest(least(coalesce(col("w"), lit(0L)), lit(1000L)), lit(0L))))
      .select("doc_id", "source", "lang", "text2", "tokens2", "h2", "kept3", "kept4")
      .transform(df => graft.Tables.labeled(spark, "q164 spine: stage-4 gate boundary")(
        stageBoundary(df))) // stage boundary: the gated corpus feeds probe + rollup

    // ---- stage 5: decontamination (q163's drop) — the SHIPPING text
    // (stage-2 bytes) is probed against the ORIGINAL benchmark slice,
    // and the held-out slice itself leaves the corpus
    val benchNg = TextOps.wordTrigrams(
        docs(spark, dir).filter(col("doc_id") % 97 === 0))
      .select("ng").distinct()
    val flagged = TextOps.wordTrigrams(graft.Tables.spreadIfTiny(
        s4.filter(col("kept4")).select(col("doc_id"), col("text2").as("text")), tinyScan))
      .join(broadcast(benchNg), Seq("ng"), "left_semi")
      .select("doc_id").distinct()
    val s5 = s4.join(flagged.withColumn("hit", lit(1L)), Seq("doc_id"), "left_outer")
      .withColumn("kept5",
        col("kept4") && col("doc_id") % 97 =!= 0 && col("hit").isNull)
    (f0, s5)
  }

  /** Content identity of the input tables a boundary-stamped pipeline run
    * reads — per table file (or directory tree) the name, byte length and
    * mtime, md5'd to a short hex stamp. Pass it as [[parquetBoundary]]'s
    * `fingerprint` so a resumed run only reuses stage artifacts computed
    * from the SAME inputs: replace or rewrite any input file and the
    * stamp changes, forcing a recompute instead of serving stale stages. */
  def inputFingerprint(sfDir: String, tables: Seq[String] = Seq("documents")): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          .sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val desc = tables.sorted.map { t =>
      val root = new java.io.File(s"$sfDir/$t.parquet")
      // a missing table must fail LOUDLY, not hash a stable "no input"
      // stamp that a later resume would treat as a legitimate identity
      require(root.exists(),
        s"inputFingerprint: $root does not exist — refusing to stamp a missing input")
      walk(root).map(x => s"${x.getName}:${x.length}:${x.lastModified}")
        .mkString(s"$t[", ",", "]")
    }.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(desc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** A durable stage boundary: write the stage output as parquet under
    * `baseDir` and read it back — the production-recovery form of the
    * default localCheckpoint (which is non-reliable storage: an executor
    * loss mid-run fails the job instead of recomputing). Each boundary
    * crossing gets its own numbered subdirectory, and a crossing whose
    * directory already holds a COMPLETED write (the `_SUCCESS` marker)
    * with a MATCHING fingerprint stamp is skipped and read back as-is —
    * so a restarted run against the same baseDir resumes from the last
    * completed stage instead of recomputing every stage from scratch
    * (CurationBoundarySpec proves the reuse: same funnel, stage files
    * untouched on the second run).
    *
    * `fingerprint` guards the resume against STALE artifacts: the stamp
    * (fingerprint + stage index) is written to a `_GRAFT_FINGERPRINT`
    * sidecar after the stage write completes, and a resume only reuses a
    * stage whose sidecar matches. Derive it from the run's input identity
    * ([[inputFingerprint]]) plus any pipeline-version tag — then reusing
    * a baseDir after the input dir, constants, or stage composition
    * change recomputes instead of silently serving the old artifacts.
    * The stage index lives in the returned closure, so ONE boundary
    * instance must not be shared across pipeline invocations — each
    * entry-point call gets its own (a shared instance would number a
    * second pipeline's stages differently than a fresh-process resume;
    * the in-stamp index turns that mistake into a recompute, not a
    * wrong-artifact read). */
  def parquetBoundary(baseDir: String, fingerprint: String = ""): DataFrame => DataFrame = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    df => {
      val i = n.getAndIncrement()
      val p = s"$baseDir/stage_$i"
      val stamp = s"graft-stage-fp v1 stage=$i fp=$fingerprint"
      val marker = new org.apache.hadoop.fs.Path(s"$p/_SUCCESS")
      val fpPath = new org.apache.hadoop.fs.Path(s"$p/_GRAFT_FINGERPRINT")
      val fs = marker.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      val reusable = fs.exists(marker) && fs.exists(fpPath) && {
        val in = fs.open(fpPath)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) == stamp
        finally in.close()
      }
      if (!reusable) {
        // overwrite clears any stale artifact (including its old sidecar);
        // the fresh stamp lands only AFTER the parquet write completed, so
        // a crash between the two leaves a recompute-on-restart state
        df.write.mode("overwrite").parquet(p)
        val out = fs.create(fpPath, true)
        try out.write(stamp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      df.sparkSession.read.parquet(p)
    }
  }

  def q164CurationExec(spark: SparkSession, dir: String,
      stageBoundary: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    val (f0, s5) = q164Spine(spark, dir, stageBoundary)
    // ---- the funnel: one rollup over the spine + stage verdicts ----
    f0.select("doc_id", "source", "tokens0", "kept1")
      .join(s5.select("doc_id", "tokens2", "h2", "kept3", "kept4", "kept5"),
        Seq("doc_id"), "left_outer")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("tokens0").as("tokens_total"),
        sum(when(col("kept1"), 1L).otherwise(0L)).as("s1_docs"),
        sum(when(col("kept1"), col("tokens0")).otherwise(0L)).as("s1_tokens"),
        sum(when(col("kept1"), col("tokens2")).otherwise(0L)).as("s2_tokens"),
        sum(when(col("kept3"), 1L).otherwise(0L)).as("s3_docs"),
        sum(when(col("kept3"), col("tokens2")).otherwise(0L)).as("s3_tokens"),
        sum(when(col("kept4"), 1L).otherwise(0L)).as("s4_docs"),
        sum(when(col("kept4"), col("tokens2")).otherwise(0L)).as("s4_tokens"),
        sum(when(col("kept5"), 1L).otherwise(0L)).as("final_docs"),
        sum(when(col("kept5"), col("tokens2")).otherwise(0L)).as("final_tokens"),
        coalesce(expr("bit_xor(CASE WHEN kept5 THEN h2 END)"), lit(0L))
          .as("corpus_fp"))
      .orderBy("source")
  }

  /** Oracle: the five standalone oracles' CTE chains spliced end to end —
    * the q41 LSH chain + recursive components (q158), the dup-run rewrite
    * over the survivors (q157), histogram calibration (q139), the DSIR
    * bucket classes + hash gate (q151), and the 3-gram benchmark probe
    * (q163) — each stage reading the previous stage's CTE. */
  /** q164's full CTE chain through the stage-5 frame `s5` — shared with
    * q167's oracle, which materializes the kept5 corpus instead of
    * rolling up the funnel. Consumers apply the WITH→WITH RECURSIVE
    * rewrite after assembly (the `reach` CTE needs it). */
  /** The full 5-stage curation CTE chain (graft-visible: q169 composes it
    * with the Lloyd chains to retrain the ANN index on the curated set). */
  private[graft] lazy val q164Ctes: String =
    (s"""$q41CtesRef,
       | dup AS (SELECT a, b FROM scored WHERE inter * 2 >= uni),
       | adjr AS (SELECT a AS src, b AS dst FROM dup UNION ALL SELECT b, a FROM dup),
       | reach(src, dst) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM adjr)
       |  UNION
       |  SELECT r.src, a2.dst FROM reach r JOIN adjr a2 ON r.dst = a2.src),
       | compx AS (SELECT src AS doc_id, MIN(dst) AS comp FROM reach GROUP BY src),
       | qual0 AS (SELECT doc_id, source, lang, text,
       |   regexp_extract_all(lower(text), '[^ \\t\\n\\r\\f]+') AS tk FROM documents),
       | qual AS (SELECT doc_id, source, lang, text,
       |   CAST(len(tk) AS BIGINT) AS tokens0,
       |   CASE WHEN len(tk) > 0 THEN CAST(len(list_distinct(tk)) AS BIGINT) * 1000 // len(tk)
       |    ELSE 0 END AS ttr FROM qual0),
       | ranked AS (SELECT c.doc_id, ROW_NUMBER() OVER (
       |    PARTITION BY c.comp ORDER BY q.ttr DESC, c.doc_id) AS rk
       |  FROM compx c JOIN qual q USING (doc_id)),
       | losers1 AS (SELECT doc_id FROM ranked WHERE rk > 1),
       | f0 AS MATERIALIZED (SELECT q.doc_id, q.source, q.lang, q.text, q.tokens0,
       |   l.doc_id IS NOT NULL AS dropped1
       |  FROM qual q LEFT JOIN losers1 l USING (doc_id)),
       | t2 AS MATERIALIZED (SELECT doc_id, source, lang, text,
       |   regexp_extract_all(text, '[^ \\t\\n\\r\\f]+') AS otoks,
       |   regexp_extract_all(lower(text), '[^ \\t\\n\\r\\f]+') AS toks
       |  FROM f0 WHERE NOT dropped1),
       | b2 AS (SELECT doc_id, toks FROM t2 WHERE len(toks) >= ${TextOps.NgramW}),
       | gr2 AS (SELECT doc_id, u.i AS i,
       |   md5(array_to_string(toks[CAST(u.i AS INTEGER):CAST(u.i + ${TextOps.NgramW - 1} AS INTEGER)], ' ')) AS g
       |  FROM b2, LATERAL (SELECT unnest(range(1, len(toks) - ${TextOps.NgramW - 2})) AS i) u),
       | rep2 AS (SELECT g FROM gr2 GROUP BY g HAVING COUNT(*) >= 2),
       | dup2 AS (SELECT doc_id, i FROM gr2 SEMI JOIN rep2 USING (g)),
       | runs2 AS (SELECT doc_id, i,
       |   i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp FROM dup2),
       | rl2 AS (SELECT doc_id, MIN(i) AS s, COUNT(*) AS run
       |  FROM runs2 GROUP BY doc_id, grp),
       | qv2 AS (SELECT doc_id, s, s + run + ${TextOps.NgramW - 2} AS e
       |  FROM rl2 WHERE run >= ${TextOps.RunThr}),
       | iv2 AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS iv
       |  FROM qv2 GROUP BY doc_id),
       | s2 AS MATERIALIZED (SELECT t2.doc_id, t2.source, t2.lang,
       |   CASE WHEN iv2.iv IS NULL THEN t2.text
       |    ELSE COALESCE(array_to_string(list_transform(list_filter(range(1, len(t2.otoks) + 1),
       |      i -> len(list_filter(iv2.iv, l -> i >= l['s'] AND i <= l['e'])) = 0),
       |     i -> t2.otoks[CAST(i AS INTEGER)]), ' '), '') END AS text2
       |  FROM t2 LEFT JOIN iv2 USING (doc_id)),
       | sc3 AS MATERIALIZED (SELECT doc_id, source, lang, text2,
       |   CAST(len(regexp_extract_all(text2, '[^ \\t\\n\\r\\f]+')) AS BIGINT) AS tokens2,
       |   CAST(('0x' || substr(md5(text2), 1, 15)) AS BIGINT) AS h2,
       |   CAST(len(regexp_extract_all(text2, '[^ \\t\\n\\r\\f]+')) AS BIGINT) * 1000
       |     // greatest(length(text2), 1) AS score
       |  FROM s2),
       | hist3 AS (SELECT source, score, COUNT(*) AS c FROM sc3 GROUP BY source, score),
       | tot3 AS (SELECT source, COUNT(*) AS total_docs FROM sc3 GROUP BY source),
       | cum3 AS (SELECT h.source, h.score, tot3.total_docs,
       |   SUM(h.c) OVER (PARTITION BY h.source ORDER BY h.score DESC
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS accepted
       |  FROM hist3 h JOIN tot3 USING (source)),
       | el3 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
       |    ORDER BY score DESC) AS rn
       |  FROM cum3 WHERE accepted * 1000 >= ${TextOps.CalibTargetPermille} * total_docs),
       | thr3 AS (SELECT source, score AS threshold FROM el3 WHERE rn = 1),
       | s3 AS MATERIALIZED (SELECT sc3.*, sc3.score >= thr3.threshold AS kept3
       |  FROM sc3 JOIN thr3 USING (source)),
       | t4 AS MATERIALIZED (SELECT s3.doc_id, s3.lang,
       |   CAST(('0x' || substr(md5(u.tok), 1, 15)) AS BIGINT) % ${TextOps.DsirBuckets} AS b
       |  FROM s3, LATERAL (SELECT unnest(regexp_extract_all(lower(s3.text2),
       |   '[^ \\t\\n\\r\\f]+')) AS tok) u
       |  WHERE s3.kept3),
       | bk4 AS (SELECT b, COUNT(*) AS r_c,
       |   SUM(CASE WHEN lang = '${TextOps.DsirTargetLang}' THEN 1 ELSE 0 END) AS t_c
       |  FROM t4 GROUP BY b),
       | tot4 AS (SELECT SUM(r_c) AS r_tot, SUM(t_c) AS t_tot FROM bk4),
       | cls4 AS (SELECT b, (t_c + 1) * r_tot * 1000 // ((r_c + 1) * t_tot) - 1000 AS cls
       |  FROM bk4, tot4),
       | pd4 AS (SELECT doc_id, SUM(cls) AS w FROM t4 JOIN cls4 USING (b) GROUP BY doc_id),
       | s4 AS MATERIALIZED (SELECT s3.doc_id, s3.source, s3.lang, s3.text2,
       |   s3.tokens2, s3.h2, s3.kept3,
       |   s3.kept3 AND
       |    CAST(('0x' || substr(md5('dsir:' || CAST(s3.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
       |     < GREATEST(LEAST(COALESCE(pd4.w, 0), 1000), 0) AS kept4
       |  FROM s3 LEFT JOIN pd4 USING (doc_id)),
       | btk5 AS (SELECT doc_id,
       |   regexp_extract_all(lower(text), '[^ \\t\\n\\r\\f]+') AS toks
       |  FROM documents WHERE doc_id % 97 = 0),
       | bench5 AS (SELECT DISTINCT unnest(CASE WHEN len(toks) >= 3
       |    THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS ng
       |  FROM btk5),
       | ntk5 AS (SELECT doc_id,
       |   regexp_extract_all(lower(text2), '[^ \\t\\n\\r\\f]+') AS toks
       |  FROM s4 WHERE kept4),
       | ng5 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
       |    THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS ng
       |  FROM ntk5),
       | flagged5 AS (SELECT DISTINCT n.doc_id FROM ng5 n JOIN bench5 b USING (ng)),
       | s5 AS (SELECT s4.*,
       |   s4.kept4 AND s4.doc_id % 97 <> 0 AND fl.doc_id IS NULL AS kept5
       |  FROM s4 LEFT JOIN flagged5 fl USING (doc_id))""").stripMargin

  lazy val q164Sql: String =
    (q164Ctes + """
       |SELECT f0.source, COUNT(*) AS n_docs,
       | CAST(SUM(f0.tokens0) AS BIGINT) AS tokens_total,
       | CAST(SUM(CASE WHEN NOT f0.dropped1 THEN 1 ELSE 0 END) AS BIGINT) AS s1_docs,
       | CAST(SUM(CASE WHEN NOT f0.dropped1 THEN f0.tokens0 ELSE 0 END) AS BIGINT) AS s1_tokens,
       | CAST(SUM(CASE WHEN NOT f0.dropped1 THEN s5.tokens2 ELSE 0 END) AS BIGINT) AS s2_tokens,
       | CAST(SUM(CASE WHEN s5.kept3 THEN 1 ELSE 0 END) AS BIGINT) AS s3_docs,
       | CAST(SUM(CASE WHEN s5.kept3 THEN s5.tokens2 ELSE 0 END) AS BIGINT) AS s3_tokens,
       | CAST(SUM(CASE WHEN s5.kept4 THEN 1 ELSE 0 END) AS BIGINT) AS s4_docs,
       | CAST(SUM(CASE WHEN s5.kept4 THEN s5.tokens2 ELSE 0 END) AS BIGINT) AS s4_tokens,
       | CAST(SUM(CASE WHEN s5.kept5 THEN 1 ELSE 0 END) AS BIGINT) AS final_docs,
       | CAST(SUM(CASE WHEN s5.kept5 THEN s5.tokens2 ELSE 0 END) AS BIGINT) AS final_tokens,
       | COALESCE(bit_xor(CASE WHEN s5.kept5 THEN s5.h2 END), 0) AS corpus_fp
       |FROM f0 LEFT JOIN s5 USING (doc_id)
       |GROUP BY f0.source ORDER BY f0.source""").stripMargin.replace("\n", " ")
      .replaceFirst("WITH ", "WITH RECURSIVE ")

  // referenced through a def so this object's init never races
  // SimilarityOps' own (q41Ctes is a val there)
  private def q41CtesRef: String = SimilarityOps.q41Ctes

  // ===========================================================
  // q167 — CURATED training-set materialization (q164 × q165 × q166,
  // the full arc in one query): the corpus q164 ships — survivors of all
  // five curation stages, carrying their REWRITTEN bytes' token counts —
  // is epoch-planned (q131's math recomputed on the CURATED per-source
  // masses, same budget × cap), replicated through a fresh
  // domain-tagged fractional gate ('cepoch:'), and globally shuffled
  // into shards under per-replica order keys ('cmat:' ‖ doc_id ‖ ':' ‖ k)
  // — q166's manifest schema, so the raw-corpus and curated-corpus
  // materializations read side by side. This is the artifact the whole
  // pipeline exists to produce: audits → executions → composed curation
  // → epoch mixture → sharded training set, one dataflow.
  //
  // Scale path: q164's spine (every stage its standalone shape, two
  // localCheckpoint stage boundaries) + one S-row plan broadcast + the
  // ≤4× map-side replica explode + the S-row manifest rollup. The
  // curated frame checkpoints once (it feeds the plan aggregation and
  // the replica branch). Fresh gate/key domains keep every draw
  // independent of q151's resample inside the pipeline, q165/q166's
  // raw-corpus run, and q162's corpus shuffle.
  // ===========================================================
  /** The curated corpus q164 ships (doc_id, source, current-bytes token
    * count) — kept5 rows, checkpointed: consumed by the plan aggregation,
    * the replica explode, and the spec's cross-checks. */
  private[graft] def q167Curated(spark: SparkSession, dir: String,
      stageBoundary: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    val (_, s5) = q164Spine(spark, dir, stageBoundary)
    s5.filter(col("kept5"))
      .select(col("doc_id"), col("source"), col("tokens2").as("tokens"))
      .transform(stageBoundary)
  }

  /** q131's epoch math over the curated per-source masses (same budget ×
    * cap; divisors guarded — a post-curation source CAN be degenerate).
    * The grand totals fold in as an unpartitioned window over the S-row
    * per-source aggregate (S = |sources|, constant-width at any corpus
    * size) instead of a 1-row crossJoin — one aggregation subtree, no
    * second pass over `cur`. */
  private[graft] def q167Plan(cur: DataFrame): DataFrame =
    cur.groupBy("source").agg(sum("tokens").as("tokens"))
      .withColumn("weight", floor(sqrt(col("tokens").cast("double"))).cast("long"))
      .withColumn("tot_tokens", sum("tokens").over(Window.partitionBy()))
      .withColumn("tot_weight", sum("weight").over(Window.partitionBy()))
      .select(col("source"), least(expr(
        s"((weight * 1000 DIV greatest(tot_weight, 1L)) * tot_tokens * ${TextOps.EpochBudgetX} DIV 1000) " +
          s"* 1000 DIV greatest(tokens, 1L)"),
        lit(TextOps.EpochCapPermille)).as("ep"))

  /** The per-replica curated order key over (`doc_id`, `k`) — fresh 'cmat:'
    * domain; shared by the replica frame and the from-files recomputation,
    * which never trusts a written column. */
  private def cmatOrderKey: org.apache.spark.sql.Column =
    graft.plans.TextKernels.md5_prefix60(concat(lit("cmat:"), col("doc_id").cast("string"),
      lit(":"), col("k").cast("string")).cast("binary"))

  /** The sharded curated-replica frame (doc_id, tokens, k, ok, shard). */
  private[graft] def q167Replicas(spark: SparkSession, dir: String,
      stageBoundary: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    val cur = q167Curated(spark, dir, stageBoundary)
    cur.join(broadcast(q167Plan(cur)), Seq("source"))
      .withColumn("gate",
        graft.plans.TextKernels.md5_prefix60(concat(lit("cepoch:"), col("doc_id").cast("string"))
          .cast("binary")) % 1000)
      .withColumn("copies",
        expr("ep DIV 1000 + CASE WHEN gate < ep % 1000 THEN 1 ELSE 0 END"))
      .filter(col("copies") > 0)
      .select(col("doc_id"), col("tokens"),
        explode(expr("sequence(0L, copies - 1L)")).as("k"))
      .withColumn("ok", cmatOrderKey)
      .withColumn("shard", pmod(col("ok"), lit(TextOps.ShuffleShards)))
  }

  def q167CuratedMaterialize(spark: SparkSession, dir: String,
      stageBoundary: DataFrame => DataFrame = _.localCheckpoint()): DataFrame =
    TextOps.q166Manifest(spark, q167Replicas(spark, dir, stageBoundary))

  /** REALIZE the capstone: write the CURATED replica multiset as S shard
    * directories, each one file internally sorted by (ok, doc_id, k) — the
    * artifact the whole pipeline exists to produce, written with
    * q166WriteShards' one-task-per-shard layout guarantee (repartition on
    * shard puts a shard's rows in one task; partitionBy splits per value). */
  def q167WriteShards(spark: SparkSession, dir: String, outPath: String): Unit =
    q167Replicas(spark, dir)
      .select(col("doc_id"), col("k"), col("ok"), col("shard"))
      .repartition(TextOps.ShuffleShards.toInt, col("shard"))
      .sortWithinPartitions(col("shard"), col("ok"), col("doc_id"), col("k"))
      .write.mode("overwrite").partitionBy("shard").parquet(outPath)

  /** Recompute the q167 manifest FROM written shard files: shard from the
    * directory a replica landed in, the order key re-derived from the
    * stored (doc_id, k), and token masses re-joined from the curated corpus
    * RECOMPUTED from source data — a misplaced replica, a dropped copy, a
    * forged id, or a replica of a non-curated doc all surface as a manifest
    * mismatch against the prediction (ShardWriteSpec). The inner join also
    * means a written doc_id outside the curated set contributes no row, so
    * the replica counts themselves diverge and fail the compare. */
  def q167ManifestFromFiles(spark: SparkSession, dir: String,
                            outPath: String): DataFrame = {
    val toks = q167Curated(spark, dir).select(col("doc_id"), col("tokens"))
    val reps = spark.read.parquet(outPath)
      .select(col("doc_id"), col("k"), col("shard").cast("long").as("shard"))
      .withColumn("ok", cmatOrderKey)
      .join(toks, Seq("doc_id"))
    TextOps.q166Manifest(spark, reps)
  }

  lazy val q167Sql: String =
    (q164Ctes + s""",
       | cur AS (SELECT doc_id, source, tokens2 AS tokens FROM s5 WHERE kept5),
       | cper AS (SELECT source, CAST(SUM(tokens) AS BIGINT) AS tokens FROM cur GROUP BY source),
       | cw AS (SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS weight FROM cper),
       | ctt AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tot_tokens,
       |   CAST(SUM(weight) AS BIGINT) AS tot_weight FROM cw),
       | cplan AS (SELECT source, LEAST(
       |   ((weight * 1000 // GREATEST(ctt.tot_weight, 1)) * ctt.tot_tokens * ${TextOps.EpochBudgetX} // 1000)
       |     * 1000 // GREATEST(tokens, 1), ${TextOps.EpochCapPermille}) AS ep
       |  FROM cw, ctt),
       | cc AS (SELECT cur.doc_id, cur.tokens, ep,
       |   ep // 1000 + CASE WHEN
       |     CAST(('0x' || substr(md5('cepoch:' || CAST(cur.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
       |     < ep % 1000 THEN 1 ELSE 0 END AS copies
       |  FROM cur JOIN cplan USING (source)),
       | cr AS (SELECT doc_id, tokens, u.k,
       |   CAST(('0x' || substr(md5('cmat:' || CAST(doc_id AS VARCHAR) || ':'
       |     || CAST(u.k AS VARCHAR)), 1, 15)) AS BIGINT) AS ok
       |  FROM cc, LATERAL (SELECT unnest(range(0, copies)) AS k) u),
       | cs AS (SELECT *, ok % ${TextOps.ShuffleShards} AS shard FROM cr),
       | cmper AS (SELECT shard, COUNT(*) AS n_replicas,
       |   COUNT(DISTINCT doc_id) AS n_docs,
       |   CAST(SUM(tokens) AS BIGINT) AS shard_tokens,
       |   CAST(MIN(CAST(ok AS HUGEINT) * 9223372036854775808 + doc_id)
       |     % 9223372036854775808 AS BIGINT) AS first_doc,
       |   bit_xor(ok) AS shard_fp
       |  FROM cs GROUP BY shard),
       | csh AS (SELECT unnest(range(0, ${TextOps.ShuffleShards})) AS shard)
       |SELECT CAST(csh.shard AS BIGINT) AS shard,
       | CAST(COALESCE(n_replicas, 0) AS BIGINT) AS n_replicas,
       | CAST(COALESCE(n_docs, 0) AS BIGINT) AS n_docs,
       | CAST(COALESCE(shard_tokens, 0) AS BIGINT) AS shard_tokens,
       | CAST(COALESCE(shard_tokens, 0) * 1000
       |   // GREATEST(SUM(COALESCE(shard_tokens, 0)) OVER (), 1) AS BIGINT) AS token_permille,
       | CAST(COALESCE(first_doc, -1) AS BIGINT) AS first_doc,
       | CAST(COALESCE(shard_fp, 0) AS BIGINT) AS shard_fp
       |FROM csh LEFT JOIN cmper USING (shard) ORDER BY shard""").stripMargin
      .replace("\n", " ").replaceFirst("WITH ", "WITH RECURSIVE ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q164_curation_exec" -> ((s, d) => q164CurationExec(s, d)),
    "q167_curated_materialize" -> ((s, d) => q167CuratedMaterialize(s, d)))

  val oracles: Map[String, String] = Map(
    "q164_curation_exec" -> q164Sql,
    "q167_curated_materialize" -> q167Sql)
}
