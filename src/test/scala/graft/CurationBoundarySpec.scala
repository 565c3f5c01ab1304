package graft

import graft.operators.CurationExec
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The composed curation pipeline's stage boundaries come in two modes:
  * localCheckpoint (cheap, non-reliable — the single-run default) and
  * write-parquet-and-reread (the production recovery form: an executor loss
  * recomputes from durable inter-stage artifacts). The pipeline's OUTPUT
  * must not depend on the mode: this spec runs q164's funnel and q167's
  * capstone manifest under both and asserts row-for-row equality —
  * fingerprints included — and that the parquet mode actually wrote the
  * inter-stage artifacts it claims to recover from. */
class CurationBoundarySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // sf0.01 (the driver's verify scale): the boundary writes move real
  // multi-row-group stage artifacts, not toy frames
  private val dir = "/root/testdata/sf0.01"

  import TestFs.{listDir, deleteRecursively}

  test("q164 funnel is identical under localCheckpoint and parquet stage boundaries") {
    val base = Files.createTempDirectory("graft_curation_stages_")
    try {
      val ckpt = CurationExec.q164CurationExec(spark, dir).collect()
      val pq = CurationExec.q164CurationExec(spark, dir,
        CurationExec.parquetBoundary(base.toString)).collect()
      assert(ckpt.length == pq.length)
      ckpt.zip(pq).foreach { case (a, b) =>
        assert(a == b, s"funnel row diverged between boundary modes: $a vs $b")
      }
      // the durable mode must have actually written its two inter-stage
      // artifacts (stage-2 rewritten corpus, stage-4 gated corpus)
      val stages = listDir(base).map(_.getFileName.toString).sorted
      assert(stages == Seq("stage_0", "stage_1"),
        s"expected two written stage boundaries, found $stages")

      // RESUME: a restarted run against the same baseDir must reuse the
      // completed stage writes (the _SUCCESS gate), not recompute them —
      // same funnel, stage files untouched
      val mtimes = listDir(base).flatMap(d => listDir(d))
        .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
      val resumed = CurationExec.q164CurationExec(spark, dir,
        CurationExec.parquetBoundary(base.toString)).collect()
      pq.zip(resumed).foreach { case (a, b) =>
        assert(a == b, s"resumed funnel diverged: $a vs $b")
      }
      listDir(base).flatMap(d => listDir(d)).foreach { f =>
        assert(Files.getLastModifiedTime(f) == mtimes(f.toString),
          s"stage file $f was rewritten on resume — the _SUCCESS skip did not hold")
      }
    } finally deleteRecursively(base)
  }

  test("a fingerprint-stamped boundary recomputes when the input changes") {
    // the staleness scenario the stamp exists for: a baseDir is reused
    // after the INPUT changed. Without the fingerprint, the _SUCCESS-only
    // resume would serve the old stage artifacts and the funnel would
    // silently describe a corpus that no longer exists.
    val base = Files.createTempDirectory("graft_fp_stages_")
    val inDir = Files.createTempDirectory("graft_fp_input_")
    try {
      // a private input corpus the spec can mutate (sf0.001 keeps it quick)
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .coalesce(1).write.parquet(s"$inDir/documents.parquet")
      val d = inDir.toString
      val run1 = CurationExec.q164CurationExec(spark, d,
        CurationExec.parquetBoundary(base.toString, CurationExec.inputFingerprint(d)))
        .collect()
      val mtimes1 = listDir(base).flatMap(x => listDir(x))
        .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap

      // same input, fresh boundary instance, same fingerprint → REUSE
      val rerun = CurationExec.q164CurationExec(spark, d,
        CurationExec.parquetBoundary(base.toString, CurationExec.inputFingerprint(d)))
        .collect()
      assert(rerun.toSeq == run1.toSeq)
      listDir(base).flatMap(x => listDir(x))
        .filterNot(_.getFileName.toString == "_GRAFT_FINGERPRINT").foreach { f =>
          assert(Files.getLastModifiedTime(f) == mtimes1(f.toString),
            s"stage file $f rewritten although input (and fingerprint) unchanged")
        }

      // MUTATE the input: rewrite the corpus with one source dropped
      val mutated = spark.read.parquet(s"$inDir/documents.parquet")
        .filter(org.apache.spark.sql.functions.col("doc_id") % 3 =!= 0)
        .collect()
      deleteRecursively(java.nio.file.Paths.get(s"$inDir/documents.parquet"))
      val schema = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").schema
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(mutated: _*)),
          schema)
        .coalesce(1).write.parquet(s"$inDir/documents.parquet")

      // stale baseDir + changed input: the stamp mismatch forces a full
      // recompute, and the funnel now describes the MUTATED corpus
      val run2 = CurationExec.q164CurationExec(spark, d,
        CurationExec.parquetBoundary(base.toString, CurationExec.inputFingerprint(d)))
        .collect()
      assert(run2.toSeq != run1.toSeq,
        "funnel unchanged after the corpus lost a third of its docs — stale stages were served")
      val nDocs1 = run1.map(_.getAs[Long]("n_docs")).sum
      val nDocs2 = run2.map(_.getAs[Long]("n_docs")).sum
      assert(nDocs2 < nDocs1, s"expected fewer docs after the mutation, got $nDocs1 -> $nDocs2")
    } finally { deleteRecursively(base); deleteRecursively(inDir) }
  }

  test("q167 capstone manifest is identical under both boundary modes") {
    val base = Files.createTempDirectory("graft_capstone_stages_")
    try {
      val ckpt = CurationExec.q167CuratedMaterialize(spark, dir).collect()
      val pq = CurationExec.q167CuratedMaterialize(spark, dir,
        CurationExec.parquetBoundary(base.toString)).collect()
      assert(ckpt.length == pq.length)
      ckpt.zip(pq).foreach { case (a, b) =>
        assert(a == b, s"manifest row diverged between boundary modes: $a vs $b")
      }
      // spine boundaries plus the curated-corpus boundary
      val stages = listDir(base).map(_.getFileName.toString).sorted
      assert(stages == Seq("stage_0", "stage_1", "stage_2"),
        s"expected three written stage boundaries, found $stages")
    } finally deleteRecursively(base)
  }
}
