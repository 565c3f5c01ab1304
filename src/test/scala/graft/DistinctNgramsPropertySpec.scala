package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property replay of q127 (distinct-n diversity): the lead()-window gram
  * construction must agree with a naive sequential slice over randomized
  * corpora — including repetition-heavy docs (tiny vocab), short docs
  * (fewer tokens than the gram width), and multi-source mixes. */
class DistinctNgramsPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (source, n) → (total, distinct) by direct slicing. */
  private def reference(
      docs: Seq[(Long, String, String)]): Seq[(String, Int, Long, Long, Long)] =
    docs.groupBy(_._3).toSeq.sortBy(_._1).flatMap { case (src, ds) =>
      (1 to 3).map { n =>
        val grams = ds.flatMap { case (_, text, _) =>
          val toks = text.toLowerCase.split("[ \t\n\r\f]+").filter(_.nonEmpty)
          (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
        }
        (src, n, grams.size.toLong, grams.distinct.size.toLong,
          grams.distinct.size.toLong * 1000 / math.max(grams.size.toLong, 1))
      }.filter(_._3 > 0)
    }

  test("random corpora: q127 equals the sequential slice reference") {
    import spark.implicits._
    import java.nio.file.Files
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val vocab = (1 to 6).map(i => s"t$i") // tiny vocab → heavy gram repeats
      val docs = (1L to 15L).map { id =>
        val len = rnd.nextInt(7) // includes 0..2-token docs (below n=3)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
          s"s${id % 2}")
      }.filter(_._2.nonEmpty)
      val dir = Files.createTempDirectory(s"graft-q127-prop$seed").toString
      docs.map { case (id, text, src) => (id, text, "en", src, 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q127_distinct_ngrams")(spark, dir).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sortBy(t => (t._1, t._2))
      val want = reference(docs).sortBy(t => (t._1, t._2))
      assert(got == want, s"seed $seed:\n got $got\nwant $want")
    }
  }
}
