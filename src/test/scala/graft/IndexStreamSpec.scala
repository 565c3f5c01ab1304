package graft

import graft.streaming.IndexStream
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class VecRec(embedding: Seq[Float], ts: Timestamp)

/** Live IVF cell-load monitor: stream ≡ batch on the same rows, the
  * assignment matches an independent Scala nearest-centroid replay, and a
  * skewed arrival window trips the split flag on exactly the hot cell. */
class IndexStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val t0 = 1699999980000L // minute-aligned
  // 2-dim toy index: two cells around (0, 0) and (1000, 1000) in the
  // 2^20 fixed-point domain the trainer quantizes into
  private val Q = 1048576.0
  private val centroids: Seq[(Int, Seq[Long])] =
    Seq((0, Seq(0L, 0L)), (1, Seq((1000 * Q).toLong, (1000 * Q).toLong)))
  private val baseCounts: Map[Int, Long] = Map(0 -> 100L, 1 -> 100L) // mean 100
  private val splitFactor = 2L // flag past 200

  private def quant(v: Seq[Float]): Seq[Long] =
    v.map(x => math.floor(x.toDouble * Q).toLong)

  /** Independent replay of the assignment: exact integer d², first-wins
    * ties over cid-ascending — the NearestCentroid contract. */
  private def assign(v: Seq[Float]): Int = {
    val qv = quant(v)
    centroids.minBy { case (cid, cq) =>
      (qv.zip(cq).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
    }._1
  }

  /** Window 1: balanced arrivals (30 per cell — no flags). Window 2:
    * 150 arrivals pile into cell 1 (100 + 150 > 200 → split flag). */
  private def recs: Seq[VecRec] =
    (0 until 60).map { i =>
      val near = if (i % 2 == 0) 0f else 1000f
      VecRec(Seq(near + (i % 7) * 0.25f, near - (i % 5) * 0.25f),
        new Timestamp(t0 + (i % 50) * 100))
    } ++ (0 until 150).map { i =>
      VecRec(Seq(1000f + (i % 9) * 0.25f, 1000f + (i % 11) * 0.25f),
        new Timestamp(t0 + 61000 + (i % 50) * 100))
    }

  test("streaming cell load equals the batch run and the independent assignment") {
    val ms = MemoryStream[VecRec](implicitly[Encoder[VecRec]], spark.sqlContext)
    val out = IndexStream.windowedCellLoad(
      ms.toDF(), "ts", "1 minute", "2 minutes", centroids, baseCounts, splitFactor)
    val q = out.writeStream
      .format("memory").queryName("ivf_out").outputMode("complete").start()
    try {
      val (first, second) = recs.splitAt(40) // split mid-window: counts must merge
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()

      val streamed = spark.sql("SELECT * FROM ivf_out ORDER BY window_start, cell")
        .collect().map(_.toSeq).toSeq
      val batch = IndexStream.windowedCellLoad(
          recs.toDF(), "ts", "1 minute", "2 minutes", centroids, baseCounts, splitFactor)
        .orderBy("window_start", "cell").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.size == 3) // w1: cells 0 and 1; w2: cell 1 only

      val byGroup = recs.groupBy(r => (r.ts.getTime >= t0 + 60000, assign(r.embedding)))
      streamed.foreach { row =>
        val Seq(ws: Timestamp, cell: String, nNew: Long, nBase: Long,
          growth: Long, split: Boolean) = row: @unchecked
        val expected = byGroup((ws.getTime >= t0 + 60000, cell.toInt)).size.toLong
        assert(nNew == expected, s"cell $cell window $ws")
        assert(nBase == baseCounts(cell.toInt))
        assert(growth == nNew * 1000 / math.max(nBase, 1L))
        assert(split == (nBase + nNew > splitFactor * 100L))
      }
      // only (window 2, cell 1) flags
      val flags = streamed.map(r => (r(0).asInstanceOf[Timestamp].getTime >= t0 + 60000,
        r(1), r.last)).toSet
      assert(flags == Set((false, "0", false), (false, "1", false), (true, "1", true)))
    } finally q.stop()
  }

  test("cell counts survive a checkpoint restart and serve through the hub") {
    val ms = MemoryStream[VecRec](implicitly[Encoder[VecRec]], spark.sqlContext)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-ckpt").toString
    val hub = new graft.control.MonitorHub()
    def start() =
      IndexStream.windowedCellLoad(
          ms.toDF(), "ts", "1 minute", "2 minutes", centroids, baseCounts, splitFactor)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(hub.sink("ivf", keyCol = "cell") _)
        .start()

    val (w1Rows, w2Rows) = recs.splitAt(60)
    val (w2a, w2b) = w2Rows.splitAt(70)
    val q1 = start()
    ms.addData(w1Rows); q1.processAllAvailable()
    ms.addData(w2a); q1.processAllAvailable()
    q1.stop() // "crash" with window 2 half-counted in the store

    val q2 = start()
    try {
      ms.addData(w2b)
      ms.addData(Seq(VecRec(Seq(0f, 0f), new Timestamp(t0 + 300000))))
      q2.processAllAvailable()
      val served = hub.json("ivf")
      // recovered counts: window-2 cell 1 must hold ALL 150 arrivals
      assert(served.contains(s""""window_start":${t0 + 60000},"cell":"1","n_new":150"""),
        s"recovered stream lost arrivals: $served")
      assert(served.contains(""""needs_split":true"""))
    } finally q2.stop()
  }
}
