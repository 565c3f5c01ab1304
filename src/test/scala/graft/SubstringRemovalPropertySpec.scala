package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property replay of q128 (substring-dedup removal accounting) against a
  * pure-Scala reference: randomized corpora built from shared phrase pools
  * (so dup runs of many lengths straddle the RunThr threshold and overlap
  * in token coverage) must produce byte-identical per-source aggregates
  * from the Spark dataflow and a direct sequential computation of
  * dup positions → islands → qualifying runs → interval union. */
class SubstringRemovalPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val W = graft.operators.TextOps.NgramW
  private val Thr = graft.operators.TextOps.RunThr

  /** (source, n_docs, tokens_total, docs_affected, tokens_removed,
    * removal_permille) computed sequentially. */
  private def reference(
      docs: Seq[(Long, String, String)]): Seq[(String, Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, text, src) =>
      (id, src, text.toLowerCase.split("[ \t\n\r\f]+").filter(_.nonEmpty).toSeq)
    }
    val grams = toks.flatMap { case (id, _, ts) =>
      (1 to ts.length - W + 1).map(i => (id, i, ts.slice(i - 1, i + W - 1).mkString(" ")))
    }
    val freq = grams.groupBy(_._3).map { case (g, v) => g -> v.size }
    val removedPerDoc: Map[Long, Long] = toks.flatMap { case (id, _, ts) =>
      val dupPos = (1 to ts.length - W + 1)
        .filter(i => freq(ts.slice(i - 1, i + W - 1).mkString(" ")) >= 2)
      // islands of consecutive positions
      val islands = dupPos.foldLeft(List.empty[(Int, Int)]) { // (start, end) inclusive
        case ((s, e) :: rest, i) if i == e + 1 => (s, i) :: rest
        case (acc, i) => (i, i) :: acc
      }.reverse
      val qualifying = islands.filter { case (s, e) => e - s + 1 >= Thr }
        .map { case (s, e) => (s, e + W - 1) } // token coverage, inclusive
      // interval union (qualifying islands are already sorted by start)
      val covered = qualifying.foldLeft((0L, 0)) { case ((tot, maxEnd), (s, e)) =>
        val from = math.max(s, maxEnd + 1)
        (tot + math.max(0, e - from + 1), math.max(maxEnd, e))
      }._1
      if (covered > 0) Some(id -> covered) else None
    }.toMap
    toks.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val nDocs = ds.size.toLong
      val total = ds.map(_._3.length.toLong).sum
      val affected = ds.count(d => removedPerDoc.contains(d._1)).toLong
      val removed = ds.flatMap(d => removedPerDoc.get(d._1)).sum
      (src, nDocs, total, affected, removed, removed * 1000 / total)
    }
  }

  test("random phrase-sharing corpora: Spark aggregate equals the sequential reference") {
    import spark.implicits._
    import java.nio.file.Files
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val vocab = (1 to 30).map(i => s"v$i")
      // phrase pool: shared verbatim spans of 3..17 tokens — some too short
      // to ever qualify, some long enough that a single occurrence pair
      // crosses RunThr, lengths near the threshold exercise the boundary
      val phrases = (1 to 6).map { _ =>
        val len = 3 + rnd.nextInt(15)
        Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      }
      var unique = 0
      val docs = (1L to 12L).map { id =>
        val parts = (1 to 1 + rnd.nextInt(4)).flatMap { _ =>
          if (rnd.nextBoolean()) phrases(rnd.nextInt(phrases.size))
          else Seq.fill(1 + rnd.nextInt(3)) { unique += 1; s"u$unique" }
        }
        (id, parts.mkString(" "), s"src${id % 3}")
      }.filter(_._2.nonEmpty)
      val dir = Files.createTempDirectory(s"graft-q128-prop$seed").toString
      docs.map { case (id, text, src) => (id, text, "en", src, 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q128_substring_removal")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
      val want = reference(docs)
      assert(got == want, s"seed $seed:\n got $got\nwant $want")
    }
  }
}
