package graft

import graft.streaming.DriftStream
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class DriftRec(topic: String, bucket: java.lang.Long, ts: Timestamp)

/** Live chi-square drift vs a reference histogram: stream ≡ batch on the
  * same rows, the statistic matches an independent q90-style computation,
  * and reference-unseen buckets report as novel mass, not chi² terms. */
class DriftStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // minute-aligned so the 1-minute event-time windows start exactly at t0
  // and t0+60s — the spec's window classification relies on it
  private val t0 = 1699999980000L
  private val ref: Map[Long, Long] = Map(0L -> 40L, 1L -> 30L, 2L -> 20L, 3L -> 10L)
  private val refN = ref.values.sum

  /** Window 1 tracks the reference shape; window 2 drifts hard (mass
    * piles into bucket 3 and a NOVEL bucket 9 appears). Two topics. */
  private def recs: Seq[DriftRec] =
    (0 until 800).map { i =>
      val drifted = i >= 400
      val b: Long =
        if (!drifted) Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L, 3L)(i % 10)
        else if (i % 20 >= 18) 9L // novel bucket, hits both topic parities
        else Seq(0L, 1L, 3L, 3L, 3L, 3L, 3L, 3L, 3L)(i % 9)
      DriftRec(if (i % 2 == 0) "alpha" else "beta", b,
        new Timestamp(t0 + (if (drifted) 61000 else 0) + (i % 50) * 100))
    }

  /** q90's batch formula, computed independently in Scala. */
  private def chi2(cur: Map[Long, Long]): Long = {
    val curN = cur.values.sum
    ref.toSeq.map { case (b, rc) =>
      val e1000 = rc * curN * 1000L / refN
      if (e1000 <= 0) 0L
      else {
        val c1000 = cur.getOrElse(b, 0L) * 1000L
        (c1000 - e1000) * (c1000 - e1000) / (e1000 * 1000L)
      }
    }.sum
  }

  test("streaming windowed drift equals the batch run and the independent q90 formula") {
    val ms = MemoryStream[DriftRec](implicitly[Encoder[DriftRec]], spark.sqlContext)
    val drift = DriftStream.windowedDrift(ms.toDF(), "ts", "1 minute", "2 minutes", ref)
    val q = drift.writeStream
      .format("memory").queryName("drift_out").outputMode("complete").start()
    try {
      val (first, second) = recs.splitAt(300) // split mid-window: state must merge
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()

      val streamed = spark.sql(
        "SELECT window_start, topic, cur_n, chi2_millis, novel_mass FROM drift_out " +
          "ORDER BY window_start, topic").collect().map(_.toSeq).toSeq
      val batch = DriftStream.windowedDrift(recs.toDF(), "ts", "1 minute", "2 minutes", ref)
        .orderBy("window_start", "topic").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.size == 4) // 2 windows x 2 topics

      // cross-check every (window, topic) against the independent formula
      val byGroup = recs.groupBy(r => (r.ts.getTime >= t0 + 60000, r.topic))
      streamed.foreach { row =>
        val Seq(ws: Timestamp, topic: String, curN: Long, chi: Long, novel: Long) = row: @unchecked
        val rows = byGroup((ws.getTime >= t0 + 60000, topic))
        val hist = rows.groupBy(_.bucket.toLong).view.mapValues(_.size.toLong).toMap
        assert(curN == rows.size)
        assert(chi == chi2(hist), s"chi2 mismatch for ($ws, $topic)")
        assert(novel == hist.view.filterKeys(b => !ref.contains(b)).values.sum)
      }

      // drifted windows must score far above the tracking windows
      val w1 = streamed.filter(_.head.asInstanceOf[Timestamp].getTime < t0 + 60000)
      val w2 = streamed.filter(_.head.asInstanceOf[Timestamp].getTime >= t0 + 60000)
      assert(w1.map(_(3).asInstanceOf[Long]).max < w2.map(_(3).asInstanceOf[Long]).min)
      assert(w1.forall(_(4) == 0L)) // no novel buckets while tracking
      assert(w2.forall(_(4).asInstanceOf[Long] > 0L))
    } finally q.stop()
  }

  test("partially-built histograms survive a checkpoint restart") {
    val ms = MemoryStream[DriftRec](implicitly[Encoder[DriftRec]], spark.sqlContext)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drift-ckpt").toString
    val out = java.util.concurrent.ConcurrentHashMap.newKeySet[Seq[Any]]()
    // append mode: a window emits once the watermark passes it — the memory
    // sink refuses checkpoint recovery, so collect via foreachBatch
    def start() =
      DriftStream.windowedDrift(ms.toDF(), "ts", "1 minute", "2 minutes", ref)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => out.add(r.toSeq)); ()
        }.start()

    val (w1Rows, w2Rows) = recs.splitAt(400) // window 1 / window 2
    val (w2a, w2b) = w2Rows.splitAt(150)

    // run 1: all of window 1 + part of window 2 buffer as open state
    val q1 = start()
    ms.addData(w1Rows); q1.processAllAvailable()
    ms.addData(w2a); q1.processAllAvailable()
    q1.stop() // "crash" with both windows' histograms in the store

    // run 2: the rest of window 2 must merge into the RECOVERED sketches,
    // then a far-future event closes both windows
    val q2 = start()
    try {
      ms.addData(w2b)
      ms.addData(Seq(DriftRec("alpha", 0L, new Timestamp(t0 + 300000))))
      q2.processAllAvailable()
      val emitted = scala.jdk.CollectionConverters.SetHasAsScala(out).asScala
        .filter(_(0).asInstanceOf[Timestamp].getTime < t0 + 120000).toSeq
        .sortBy(r => (r(0).asInstanceOf[Timestamp].getTime, r(1).asInstanceOf[String]))
      val batch = DriftStream.windowedDrift(recs.toDF(), "ts", "1 minute", "2 minutes", ref)
        .orderBy("window_start", "topic").collect().map(_.toSeq).toSeq
      assert(emitted == batch, "recovered stream diverged from the batch run")
    } finally q2.stop()
  }

  test("hist_sketch is exact and merge-invariant over random splits") {
    val rnd = new scala.util.Random(11)
    val values = Array.fill(3000)(rnd.nextInt(50).toLong)
    val exact = values.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val hs = new graft.functions.HistogramSketch
    for (seed <- 1 to 4) {
      val r = new scala.util.Random(seed)
      val parts = r.shuffle(values.toSeq).grouped(1 + r.nextInt(500)).toSeq
      val bufs = r.shuffle(parts.map(p => p.foldLeft(hs.zero)(hs.reduce)))
      assert(hs.finish(bufs.reduce(hs.merge)) == exact)
    }
  }

  test("hist_sketch fails loudly past the bucket-domain bound") {
    val hs = new graft.functions.HistogramSketch
    val over = (0L to graft.functions.HistogramSketch.MaxEntries.toLong)
    assertThrows[IllegalArgumentException] {
      over.foldLeft(hs.zero)(hs.reduce)
    }
  }
}
