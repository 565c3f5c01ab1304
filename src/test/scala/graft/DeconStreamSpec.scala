package graft

import graft.streaming.DeconStream
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class ArrivalRec(embedding: Seq[Float], source: String, ts: Timestamp)

/** Live semantic-decon monitor: stream ≡ batch on the same rows, flags
  * match an independent Scala cosine replay, planted benchmark copies are
  * always caught, and orthogonal arrivals never are. */
class DeconStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val t0 = 1699999980000L // minute-aligned
  // benchmark suite: two non-unit vectors along distinct directions —
  // the monitor must normalize them itself
  private val benchmark: Seq[Seq[Double]] =
    Seq(Seq(2.0, 0.0, 0.0, 0.0), Seq(0.0, 0.0, 3.0, 3.0))
  private val tauPermille = 900L

  private def cosineMax(v: Seq[Float]): Double = {
    val vd = v.map(_.toDouble)
    val nv = math.sqrt(vd.map(x => x * x).sum)
    benchmark.map { b =>
      val nb = math.sqrt(b.map(x => x * x).sum)
      vd.zip(b).map { case (x, y) => x * y }.sum / (nv * nb)
    }.max
  }

  /** Window 1: clean arrivals from two sources (axis-orthogonal-ish).
    * Window 2: source "crawlA" starts leaking — scaled copies of benchmark
    * vectors (cosine exactly 1.0) mixed with clean rows. */
  private def recs: Seq[ArrivalRec] =
    (0 until 40).map { i =>
      val src = if (i % 2 == 0) "crawlA" else "crawlB"
      ArrivalRec(Seq(0f, 1f + (i % 5) * 0.1f, 0f, -0.2f * (i % 3)), src,
        new Timestamp(t0 + (i % 50) * 100))
    } ++ (0 until 30).map { i =>
      val leak = i % 3 == 0 // 10 planted leaks
      val v = if (leak) Seq(0f, 0f, 7f, 7f) else Seq(0.3f, 1f, 0f, 0.1f * (i % 4))
      ArrivalRec(v, "crawlA", new Timestamp(t0 + 61000 + (i % 50) * 100))
    }

  test("streaming leakage equals the batch run and the independent cosine replay") {
    val ms = MemoryStream[ArrivalRec](implicitly[Encoder[ArrivalRec]], spark.sqlContext)
    val out = DeconStream.windowedLeakage(
      ms.toDF(), "ts", "1 minute", "2 minutes", benchmark, tauPermille)
    val q = out.writeStream
      .format("memory").queryName("decon_out").outputMode("complete").start()
    try {
      val (first, second) = recs.splitAt(25) // split mid-window: counts must merge
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()

      val streamed = spark.sql("SELECT * FROM decon_out ORDER BY window_start, source")
        .collect().map(_.toSeq).toSeq
      val batch = DeconStream.windowedLeakage(
          recs.toDF(), "ts", "1 minute", "2 minutes", benchmark, tauPermille)
        .orderBy("window_start", "source").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.size == 3) // w1: crawlA + crawlB; w2: crawlA only

      // independent replay: per (window, source) flag counts from plain Scala
      val expected = recs.groupBy(r => (r.ts.getTime >= t0 + 60000, r.source))
        .view.mapValues { rs =>
          (rs.size.toLong,
            rs.count(r => math.floor(cosineMax(r.embedding) * 1000.0) >= tauPermille).toLong)
        }.toMap
      streamed.foreach { row =>
        val Seq(ws: Timestamp, src: String, n: Long, flagged: Long, maxSim: Long) = row: @unchecked
        val key = (ws.getTime >= t0 + 60000, src)
        assert((n, flagged) == expected(key), s"mismatch at $key")
        assert(maxSim <= 1000L, "cosine permille cannot exceed 1000")
      }
      // the leak window: exactly the 10 planted copies flag, at cosine 1.0
      val leakRow = streamed.find { r =>
        r.head.asInstanceOf[Timestamp].getTime >= t0 + 60000
      }.get
      assert(leakRow(3) == 10L)
      assert(leakRow(4) == 1000L)
      // the clean window flags nothing
      streamed.filter(_.head.asInstanceOf[Timestamp].getTime < t0 + 60000)
        .foreach(r => assert(r(3) == 0L))
    } finally q.stop()
  }

  test("zero benchmark vectors are rejected") {
    intercept[IllegalArgumentException] {
      DeconStream.windowedLeakage(recs.toDF(), "ts", "1 minute", "2 minutes",
        Seq(Seq(0.0, 0.0)), tauPermille)
    }
  }
}
