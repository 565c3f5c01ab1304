package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the distributed BPE trainer: on randomized
  * overlap-heavy vocabularies (tiny alphabet → runs like "aaab" where
  * greedy non-overlapping merge semantics actually bite), the Spark
  * dataflow must reproduce a pure-Scala reference trainer exactly —
  * merge table, counts, and the final vocabulary strings. */
class BpeTrainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Rounds = graft.operators.TextOps.NMerges

  /** Pure-Scala reference: same wrapped representation, same greedy
    * left-to-right non-overlapping merge (String.replace), same
    * (count desc, l, r) argmax. */
  private def referenceBpe(words: Map[String, Long])
      : (Seq[(Int, String, String, Long)], Map[String, Long]) = {
    var vocab: Map[String, Long] =
      words.map { case (w, c) => (w.map(ch => s" $ch ").mkString(""), c) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (round <- 1 to Rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, c) <- vocab) {
        val syms = w.trim.split("  ")
        if (syms.length >= 2)
          syms.sliding(2).foreach { case Array(l, r) => counts((l, r)) += c; case _ => }
      }
      val ((l, r), cnt) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      vocab = vocab.groupMapReduce {
        case (w, _) => w.replace(s" $l  $r ", s" $l$r ")
      }(_._2)(_ + _)
      merges += ((round, l, r, cnt))
    }
    (merges.result(), vocab)
  }

  test("Spark trainer ≡ reference trainer on randomized overlap-heavy vocabularies") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // alphabet {a, b}: maximal pair collisions and overlapping runs
      val words = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
      }.distinct.map(w => w -> (1L + rnd.nextInt(9))).toMap
      val wc = words.toSeq.toDF("word", "c")

      val (merges, finalVocab) = graft.operators.TextOps.bpeTrainOn(wc)
      val sparkMerges = merges.map { case (round, l, r, _, cnt, _) => (round, l, r, cnt) }
      val sparkVocab = finalVocab.collect()
        .map(r => r.getString(1) -> r.getLong(2))
        .groupMapReduce(_._1)(_._2)(_ + _)

      val (refMerges, refVocab) = referenceBpe(words)
      assert(sparkMerges == refMerges, s"seed $seed: merge tables diverge")
      assert(sparkVocab == refVocab, s"seed $seed: final vocabularies diverge")

      // the corpus_symbols sequence is strictly decreasing and consistent
      val symSeq = merges.map(_._6)
      assert(symSeq.zip(symSeq.tail).forall { case (a, b) => a > b })
    }
  }
}
