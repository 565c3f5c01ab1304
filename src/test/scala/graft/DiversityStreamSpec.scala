package graft

import graft.streaming.DiversityStream
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class DivRec(source: String, text: String, ts: Timestamp)

/** Live distinct-n diversity monitor: stream ≡ batch on the same rows,
  * the KMV estimate is EXACT below sketch capacity (asserted against an
  * independent Scala distinct count), and a template-spam collapse flips
  * the one-sided flag while the healthy source stays quiet. */
class DiversityStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val t0 = 1699999980000L // minute-aligned
  private val N = 2
  private val K = 256
  private val thr = 200L

  /** Window 1: both sources mint fresh bigrams every doc. Window 2: src_a
    * keeps minting; src_b collapses to ONE repeated template. Doc length 4
    * tokens → 3 bigrams; 50 docs per (window, source) → ≤150 distinct
    * bigrams, under K, so the sketch is exhaustive and estimates are
    * exact. */
  private def recs: Seq[DivRec] = (0 until 200).map { i =>
    val w2 = i >= 100
    val src = if (i % 2 == 0) "src_a" else "src_b"
    val text =
      if (w2 && src == "src_b") "spam one spam one"
      else s"d${i}a d${i}b d${i}c d${i}d"
    DivRec(src, text, new Timestamp(t0 + (if (w2) 61000 else 0) + (i % 50) * 100))
  }

  /** Exact distinct-N reference: (total grams, distinct grams). */
  private def diversity(texts: Seq[String]): (Long, Long) = {
    val grams = texts.flatMap { t =>
      val toks = t.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
      (0 to toks.length - N).map(i => toks.slice(i, i + N).mkString(" "))
    }
    (grams.size.toLong, grams.distinct.size.toLong)
  }

  private lazy val baseline: Map[String, Long] = {
    val w1 = recs.filter(_.ts.getTime < t0 + 60000)
    Seq("src_a", "src_b").map { s =>
      val (tot, dist) = diversity(w1.filter(_.source == s).map(_.text))
      s -> dist * 1000 / tot
    }.toMap
  }

  test("streaming diversity equals the batch run and the exact distinct count") {
    val ms = MemoryStream[DivRec](implicitly[Encoder[DivRec]], spark.sqlContext)
    val out = DiversityStream.windowedDiversity(
      ms.toDF(), "ts", "1 minute", "2 minutes", N, K, baseline, thr)
    val q = out.writeStream
      .format("memory").queryName("div_out").outputMode("complete").start()
    try {
      val (first, second) = recs.splitAt(70) // split mid-window: sketches must merge
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()

      val streamed = spark.sql("SELECT * FROM div_out ORDER BY window_start, source")
        .collect().map(_.toSeq).toSeq
      val batch = DiversityStream.windowedDiversity(
          recs.toDF(), "ts", "1 minute", "2 minutes", N, K, baseline, thr)
        .orderBy("window_start", "source").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.size == 4) // 2 windows x 2 sources

      val byGroup = recs.groupBy(r => (r.ts.getTime >= t0 + 60000, r.source))
      streamed.foreach { row =>
        val Seq(ws: Timestamp, src: String, nDocs: Long, total: Long, est: Double,
          estPm: Long, basePm: Long, drift: Long, collapsed: Boolean) = row: @unchecked
        val rows = byGroup((ws.getTime >= t0 + 60000, src))
        val (tot, dist) = diversity(rows.map(_.text))
        assert(nDocs == rows.size && total == tot)
        assert(est == dist.toDouble, s"below-capacity KMV must be exact: $est vs $dist")
        assert(estPm == dist * 1000 / tot)
        assert(basePm == baseline(src))
        assert(drift == estPm - basePm)
        assert(collapsed == (drift <= -thr))
      }

      // one-sided: only (window 2, src_b) collapses
      val flags = streamed.map(r => (r(0).asInstanceOf[Timestamp].getTime >= t0 + 60000,
        r(1), r.last)).toSet
      assert(flags == Set((false, "src_a", false), (false, "src_b", false),
        (true, "src_a", false), (true, "src_b", true)))
    } finally q.stop()
  }

  test("half-built window sketches survive a checkpoint restart") {
    val ms = MemoryStream[DivRec](implicitly[Encoder[DivRec]], spark.sqlContext)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-div-ckpt").toString
    val out = java.util.concurrent.ConcurrentHashMap.newKeySet[Seq[Any]]()
    def start() =
      DiversityStream.windowedDiversity(
          ms.toDF(), "ts", "1 minute", "2 minutes", N, K, baseline, thr)
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
    q1.stop() // "crash" with window 2's sketch half-merged in the store

    val q2 = start()
    try {
      ms.addData(w2b)
      ms.addData(Seq(DivRec("src_a", "late one late two", new Timestamp(t0 + 300000))))
      q2.processAllAvailable()
      val emitted = scala.jdk.CollectionConverters.SetHasAsScala(out).asScala
        .filter(_(0).asInstanceOf[Timestamp].getTime < t0 + 120000).toSeq
        .sortBy(r => (r(0).asInstanceOf[Timestamp].getTime, r(1).asInstanceOf[String]))
      val batch = DiversityStream.windowedDiversity(
          recs.toDF(), "ts", "1 minute", "2 minutes", N, K, baseline, thr)
        .orderBy("window_start", "source").collect().map(_.toSeq).toSeq
      assert(emitted == batch, "recovered stream diverged from the batch run")
    } finally q2.stop()
  }
}
