package graft

import graft.operators.CurationPipeline
import graft.streaming.CurationStream
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class CurRec(source: String, text: String, lang: String, ts: Timestamp)

/** Live curation funnel: stream ≡ batch on the same rows, the windowed
  * drop counts agree with the batch pipeline's own attribution, and a
  * mid-ingest source defect (language switch) surfaces in exactly its
  * window and stage. */
class CurationStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val t0 = 1699999980000L // minute-aligned
  private val stages = CurationPipeline.statelessStages()

  /** Window 1: both sources healthy English. Window 2: src_b switches to
    * German text while still declaring lang=en (the lang_mismatch gate's
    * target); a few too-short docs ride along in every group. */
  private def recs: Seq[CurRec] = (0 until 160).map { i =>
    val w2 = i >= 80
    val src = if (i % 2 == 0) "src_a" else "src_b"
    val text =
      if (i % 10 == 7) "tiny doc" // fails too_short everywhere
      else if (w2 && src == "src_b") "der hund und die katze laufen im park heute schnell"
      else "the quick brown fox and the lazy dog keep running around the yard"
    CurRec(src, text, "en", new Timestamp(t0 + (if (w2) 61000 else 0) + (i % 40) * 100))
  }

  test("streaming funnel equals batch and the pipeline's own attribution") {
    val ms = MemoryStream[CurRec](implicitly[Encoder[CurRec]], spark.sqlContext)
    val out = CurationStream.windowedFunnel(ms.toDF(), "ts", "1 minute", "2 minutes", stages)
    val q = out.writeStream
      .format("memory").queryName("cur_out").outputMode("complete").start()
    try {
      val (first, second) = recs.splitAt(50) // split mid-window: counts must merge
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()

      val streamed = spark.sql("SELECT * FROM cur_out ORDER BY window_start, source")
        .collect().map(_.toSeq).toSeq
      val batch = CurationStream.windowedFunnel(recs.toDF(), "ts", "1 minute", "2 minutes", stages)
        .orderBy("window_start", "source").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.size == 4) // 2 windows × 2 sources

      // every row against CurationPipeline.run's attribution on its slice
      streamed.foreach { row =>
        val Seq(ws: Timestamp, src: String, nDocs: Long, tooShort: Long, repetitive: Long,
          langMismatch: Long, kept: Long, keptPm: Long) = row: @unchecked
        val w2 = ws.getTime >= t0 + 60000
        val slice = recs.filter(r => r.source == src && (r.ts.getTime >= t0 + 60000) == w2)
        val res = CurationPipeline.run(
          slice.toDF().drop("ts").withColumn("doc_id",
            org.apache.spark.sql.functions.monotonically_increasing_id()), stages)
        val counts = res.annotated.groupBy("drop_stage").count().collect()
          .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
        assert(nDocs == slice.size)
        assert(tooShort == counts.getOrElse(Some("too_short"), 0L))
        assert(repetitive == counts.getOrElse(Some("repetitive"), 0L))
        assert(langMismatch == counts.getOrElse(Some("lang_mismatch"), 0L))
        assert(kept == counts.getOrElse(None, 0L))
        assert(keptPm == kept * 1000 / nDocs)
      }

      // the defect is visible in exactly (window 2, src_b, lang_mismatch)
      val mismatches = streamed.map(r => ((r(0).asInstanceOf[Timestamp].getTime >= t0 + 60000,
        r(1)), r(5).asInstanceOf[Long])).toMap
      assert(mismatches((false, "src_a")) == 0L && mismatches((false, "src_b")) == 0L)
      assert(mismatches((true, "src_a")) == 0L)
      assert(mismatches((true, "src_b")) > 0L)
    } finally q.stop()
  }

  test("half-built window funnels survive a checkpoint restart") {
    val ms = MemoryStream[CurRec](implicitly[Encoder[CurRec]], spark.sqlContext)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cur-ckpt").toString
    val out = java.util.concurrent.ConcurrentHashMap.newKeySet[Seq[Any]]()
    def start() =
      CurationStream.windowedFunnel(ms.toDF(), "ts", "1 minute", "2 minutes", stages)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => out.add(r.toSeq)); ()
        }.start()

    val (w1Rows, w2Rows) = recs.splitAt(80)
    val (w2a, w2b) = w2Rows.splitAt(30)
    val q1 = start()
    ms.addData(w1Rows); q1.processAllAvailable()
    ms.addData(w2a); q1.processAllAvailable()
    q1.stop() // "crash" with window 2 half-counted in the store

    val q2 = start()
    try {
      ms.addData(w2b)
      ms.addData(Seq(CurRec("src_a", "late words arriving here now", "en",
        new Timestamp(t0 + 300000))))
      q2.processAllAvailable()
      val emitted = scala.jdk.CollectionConverters.SetHasAsScala(out).asScala
        .filter(_(0).asInstanceOf[Timestamp].getTime < t0 + 120000).toSeq
        .sortBy(r => (r(0).asInstanceOf[Timestamp].getTime, r(1).asInstanceOf[String]))
      val batch = CurationStream.windowedFunnel(recs.toDF(), "ts", "1 minute", "2 minutes", stages)
        .orderBy("window_start", "source").collect().map(_.toSeq).toSeq
      assert(emitted == batch, "recovered stream diverged from the batch run")
    } finally q2.stop()
  }
}
