package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q142/q143 semantics on constructed data: the shipped corpora carry no
  * exact duplicates below sf0.1, so the generic oracle round-trip alone
  * would pass these queries on empty results. Here cross-source copies
  * are planted explicitly: normalization (case / whitespace squeeze) must
  * unify the copies, origin must be the minimum doc_id, and the yield
  * curve must bucket clusters by multiplicity with keep-first removability. */
class CopyAttributionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // T1 cluster (4 copies across A/B), T2 cluster (2 copies B->C), 1 unique
  private val rows = Seq(
    (1L, "alpha beta gamma delta", "en", "srcA"),
    (2L, "ALPHA  beta GAMMA delta", "en", "srcB"),   // case+squeeze copy
    (3L, "alpha beta gamma delta", "en", "srcB"),    // verbatim copy
    (4L, " alpha beta gamma  delta ", "en", "srcA"), // trim+squeeze copy
    (5L, "unique text here", "en", "srcC"),
    (6L, "epsilon zeta", "en", "srcB"),
    (7L, "Epsilon  Zeta", "en", "srcC"))             // copy of 6

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-copyattr").toString
    import spark.implicits._
    rows.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q142 attributes copies to the earliest doc's source, normalized") {
    val out = graft.operators.TextOps.q142CopyAttribution(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    val chars = rows.map { case (id, t, _, _) => id -> t.length.toLong }.toMap
    assert(out.map(_._1).toSeq == Seq(("srcA", "srcA"), ("srcA", "srcB"), ("srcB", "srcC")),
      s"unexpected edge set/order: ${out.toSeq}")
    val m = out.toMap
    assert(m(("srcA", "srcA")) == ((1L, 1L, chars(4L))), "self-edge (doc 4)")
    assert(m(("srcA", "srcB")) == ((2L, 1L, chars(2L) + chars(3L))),
      "A->B must count docs 2+3 as ONE digest")
    assert(m(("srcB", "srcC")) == ((1L, 1L, chars(7L))), "B->C (doc 7)")
  }

  test("q143 buckets clusters by multiplicity with keep-first removability") {
    val out = graft.operators.TextOps.q143DedupYield(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // bucket -> (n_clusters, n_docs, total_tokens, removable, permille, cum)
    assert(out(1L) == ((1L, 1L, 3L, 0L, 0L, 14L)), s"bucket 1: ${out.get(1L)}")
    assert(out(2L) == ((1L, 2L, 4L, 2L, 500L, 14L)), s"bucket 2: ${out.get(2L)}")
    assert(out(4L) == ((1L, 4L, 16L, 12L, 750L, 12L)), s"bucket 4: ${out.get(4L)}")
    assert(out.keySet == Set(1L, 2L, 4L))
  }

  test("q155 selects the most conservative threshold retaining 900‰ of savings") {
    // thresholds are the observed multiplicities >= 2: t=4 saves 12 of the
    // max 14 tokens (857‰ — below the 900‰ target), t=2 saves all 14
    // (1000‰) — so full dedup is the selected policy here, and the t=4 row
    // documents exactly what the conservative alternative would forgo
    val out = graft.operators.TextOps.q155DedupPolicy(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // threshold -> (clusters_hit, docs_removed, tokens_saved, permille, selected)
    assert(out.keySet == Set(2L, 4L), s"thresholds: ${out.keySet}")
    assert(out(4L) == ((1L, 3L, 12L, 857L, 0L)), s"t=4 row: ${out.get(4L)}")
    assert(out(2L) == ((2L, 4L, 14L, 1000L, 1L)), s"t=2 row: ${out.get(2L)}")
  }
}
