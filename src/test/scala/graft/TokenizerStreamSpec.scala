package graft

import graft.streaming.TokenizerStream
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class TokRec(source: String, text: String, ts: Timestamp)

/** Live tokenizer-fit monitor: stream ≡ batch on the same rows, the
  * fertility matches an independent Scala replay of the merge semantics,
  * and a vocabulary shift flips the drift flag while the tracking source
  * stays quiet. */
class TokenizerStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val t0 = 1699999980000L // minute-aligned
  // a trained merge prefix: "th", then "the" (second merge consumes the
  // first's output — order dependence is part of what the spec pins)
  private val merges = Seq(("t", "h"), ("th", "e"))
  private val thr = 300L

  /** Independent replay of the training-side merge semantics: plain
    * String.replace is the same greedy non-overlapping left-to-right
    * scan the column chain uses. */
  private def symbolsOf(tok: String): Long = {
    val wrapped = tok.toLowerCase.map(c => s" $c ").mkString("")
    val merged = merges.foldLeft(wrapped) { case (s, (l, r)) =>
      s.replace(s" $l  $r ", s" $l$r ")
    }
    merged.trim.split("  ").length.toLong
  }

  private def fertility(texts: Seq[String]): (Long, Long) = {
    val toks = texts.flatMap(_.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty))
    (toks.size.toLong, toks.map(symbolsOf).sum)
  }

  /** Window 1: both sources speak merge-friendly text ("the thing...").
    * Window 2: src_a keeps tracking; src_b shifts to a vocabulary the
    * merges never fire on — fertility jumps to chars-per-word. */
  private def recs: Seq[TokRec] = {
    val tracking = "the thin thing then the lathe"
    val shifted = "zork quux vblam grok zork mixr"
    (0 until 200).map { i =>
      val w2 = i >= 100
      val src = if (i % 2 == 0) "src_a" else "src_b"
      val text = if (w2 && src == "src_b") shifted else tracking
      TokRec(src, text, new Timestamp(t0 + (if (w2) 61000 else 0) + (i % 50) * 100))
    }
  }

  // baseline = the trained (window-1) fertility per source
  private lazy val baseline: Map[String, Long] = {
    val w1 = recs.filter(_.ts.getTime < t0 + 60000)
    Map("src_a" -> 0L, "src_b" -> 0L).keys.map { s =>
      val (w, sy) = fertility(w1.filter(_.source == s).map(_.text))
      s -> sy * 1000 / w
    }.toMap
  }

  test("streaming fertility equals the batch run and the independent merge replay") {
    val ms = MemoryStream[TokRec](implicitly[Encoder[TokRec]], spark.sqlContext)
    val out = TokenizerStream.windowedFertility(
      ms.toDF(), "ts", "1 minute", "2 minutes", merges, baseline, thr)
    val q = out.writeStream
      .format("memory").queryName("tok_out").outputMode("complete").start()
    try {
      val (first, second) = recs.splitAt(70) // split mid-window: sums must merge
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()

      val streamed = spark.sql("SELECT * FROM tok_out ORDER BY window_start, source")
        .collect().map(_.toSeq).toSeq
      val batch = TokenizerStream.windowedFertility(
          recs.toDF(), "ts", "1 minute", "2 minutes", merges, baseline, thr)
        .orderBy("window_start", "source").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.size == 4) // 2 windows x 2 sources

      // every (window, source) row against the independent replay
      val byGroup = recs.groupBy(r => (r.ts.getTime >= t0 + 60000, r.source))
      streamed.foreach { row =>
        val Seq(ws: Timestamp, src: String, nDocs: Long, words: Long, symbols: Long,
          fert: Long, basePm: Long, drift: Long, flagged: Boolean) = row: @unchecked
        val rows = byGroup((ws.getTime >= t0 + 60000, src))
        val (w, sy) = fertility(rows.map(_.text))
        assert(nDocs == rows.size && words == w && symbols == sy)
        assert(fert == sy * 1000 / w)
        assert(basePm == baseline(src))
        assert(drift == fert - basePm)
        assert(flagged == (math.abs(drift) >= thr))
      }

      // only (window 2, src_b) drifts; src_a tracks its baseline exactly
      val flags = streamed.map(r => (r(0).asInstanceOf[Timestamp].getTime >= t0 + 60000,
        r(1), r.last)).toSet
      assert(flags == Set((false, "src_a", false), (false, "src_b", false),
        (true, "src_a", false), (true, "src_b", true)))
    } finally q.stop()
  }

  test("half-built window sums survive a checkpoint restart") {
    val ms = MemoryStream[TokRec](implicitly[Encoder[TokRec]], spark.sqlContext)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tok-ckpt").toString
    val out = java.util.concurrent.ConcurrentHashMap.newKeySet[Seq[Any]]()
    def start() =
      TokenizerStream.windowedFertility(
          ms.toDF(), "ts", "1 minute", "2 minutes", merges, baseline, thr)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => out.add(r.toSeq)); ()
        }.start()

    val (w1Rows, w2Rows) = recs.splitAt(100)
    val (w2a, w2b) = w2Rows.splitAt(40)
    val q1 = start()
    ms.addData(w1Rows); q1.processAllAvailable()
    ms.addData(w2a); q1.processAllAvailable()
    q1.stop() // "crash" with window 2 half-summed in the store

    val q2 = start()
    try {
      ms.addData(w2b)
      ms.addData(Seq(TokRec("src_a", "the", new Timestamp(t0 + 300000))))
      q2.processAllAvailable()
      val emitted = scala.jdk.CollectionConverters.SetHasAsScala(out).asScala
        .filter(_(0).asInstanceOf[Timestamp].getTime < t0 + 120000).toSeq
        .sortBy(r => (r(0).asInstanceOf[Timestamp].getTime, r(1).asInstanceOf[String]))
      val batch = TokenizerStream.windowedFertility(
          recs.toDF(), "ts", "1 minute", "2 minutes", merges, baseline, thr)
        .orderBy("window_start", "source").collect().map(_.toSeq).toSeq
      assert(emitted == batch, "recovered stream diverged from the batch run")
    } finally q2.stop()
  }
}
