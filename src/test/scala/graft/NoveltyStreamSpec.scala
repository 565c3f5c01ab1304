package graft

import graft.streaming.NoveltyStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** NoveltyStream must equal a deterministic replay of its own contract:
  * same gram definition as batch q138, same Bloom probe arithmetic as
  * BloomSketch, sorted intra-trigger insertion — so the streamed report
  * is reproducible bit-for-bit, and below saturation it is EXACT. */
class NoveltyStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val NumBits = 1 << 16
  private val NumProbes = 3

  /** plain-Scala replay of the processor's contract over per-trigger
    * (source, h) gram lists */
  private def replay(triggers: Seq[Seq[(String, Long)]]): Map[(String, Long), (Long, Long, Long)] = {
    val bits = scala.collection.mutable.Map.empty[String, Array[Long]]
    val trig = scala.collection.mutable.Map.empty[String, Long]
    val cum = scala.collection.mutable.Map.empty[String, Long]
    val out = scala.collection.mutable.Map.empty[(String, Long), (Long, Long, Long)]
    triggers.foreach { batch =>
      batch.groupBy(_._1).foreach { case (src, rows) =>
        val b = bits.getOrElseUpdate(src, new Array[Long](NumBits / 64))
        val types = rows.map(_._2).distinct.sorted
        var novel = 0L
        types.foreach { v =>
          var isNew = false
          (0 until NumProbes).foreach { i =>
            val bit = graft.functions.BloomSketch.probeBit(v, i, NumBits)
            if ((b(bit >>> 6) & (1L << (bit & 63))) == 0L) {
              isNew = true; b(bit >>> 6) |= (1L << (bit & 63))
            }
          }
          if (isNew) novel += 1
        }
        val t = trig.getOrElse(src, 0L) + 1
        trig(src) = t
        cum(src) = cum.getOrElse(src, 0L) + novel
        if (types.nonEmpty)
          out((src, t)) = (types.size.toLong, novel, cum(src))
      }
    }
    out.toMap
  }

  private def docText(words: Seq[String]): String = words.mkString(" ")

  test("streamed novelty equals the deterministic replay; repeats report zero") {
    // trigger 1: fresh vocab per source; trigger 2: half repeats of
    // trigger 1 plus fresh; trigger 3: full repeat of trigger 1
    def fresh(src: String, t: Int, n: Int): Seq[String] =
      (0 until n).map(i => s"${src}w${t}_$i")
    val t1 = Seq(
      ("srcA", docText(fresh("a", 1, 40))),
      ("srcB", docText(fresh("b", 1, 40))))
    val t2 = Seq(
      ("srcA", docText(fresh("a", 1, 40).take(20) ++ fresh("a", 2, 20))),
      ("srcB", docText(fresh("b", 2, 40))))
    val t3 = Seq(
      ("srcA", docText(fresh("a", 1, 40))),
      ("srcB", docText(fresh("b", 1, 40))))
    val batches = Seq(t1, t2, t3)

    // gram lists via the SAME column definition the stream uses
    val gramLists = batches.map { b =>
      NoveltyStream.gramHashes(b.toDF("source", "text"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val expected = replay(gramLists)

    val input = MemoryStream[(String, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, String)]], spark.sqlContext)
    val q = NoveltyStream.monitor(
        input.toDF().toDF("source", "text"), NumBits, NumProbes)
      .writeStream.outputMode("append").format("memory").queryName("novelty").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.sql("SELECT * FROM novelty").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
      assert(got == expected, s"stream != replay\n got=$got\n exp=$expected")
      // semantic shape: first sight is all-novel, a full repeat is zero
      val a1 = got(("srcA", 1L)); val a3 = got(("srcA", 3L))
      assert(a1._1 == a1._2, s"trigger 1 should be fully novel: $a1")
      assert(a3._2 == 0L, s"full repeat should report zero novelty: $a3")
      // trigger 2 of srcA: 20 repeated words → sliding 3-grams over the
      // 40-token doc give partial novelty strictly between the extremes
      val a2 = got(("srcA", 2L))
      assert(a2._2 > 0L && a2._2 < a2._1, s"partial repeat: $a2")
      // state is O(sources): one Hist row per source
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4L, s"state not O(sources): $stateRows rows")
    } finally q.stop()
  }

  test("Bloom history survives a checkpoint restart") {
    // the monitor's whole value is cross-trigger memory; a restart that
    // forgot the filter would re-report everything as novel
    val ckpt = java.nio.file.Files.createTempDirectory("graft-novelty-ckpt").toString
    val input = MemoryStream[(String, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, String)]], spark.sqlContext)
    val text = (0 until 30).map(i => s"restart$i").mkString(" ")
    // the memory sink cannot recover a checkpoint; collect through
    // foreachBatch (which can) into a JVM-shared buffer
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    def start() = NoveltyStream.monitor(
        input.toDF().toDF("source", "text"), NumBits, NumProbes)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[NoveltyStream.NoveltyRow], _: Long) =>
        b.collect().foreach(r => got.add((r.trigger, r.types_novel, r.cum_novel))); ()
      }
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try { input.addData(Seq(("s", text))); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      input.addData(Seq(("s", text))) // full repeat, across the restart
      q2.processAllAvailable()
      val rows = got.toArray(Array.empty[(Long, Long, Long)]).sortBy(_._1)
      assert(rows.length == 2, rows.mkString(","))
      assert(rows(0)._2 == 28L, s"pre-restart trigger: ${rows(0)}")
      assert(rows(1) == ((2L, 0L, 28L)),
        s"restart forgot the Bloom history: ${rows(1)}")
    } finally q2.stop()
  }

  test("fill_permille reports saturation; novelty is a lower bound under it") {
    // a TINY filter saturates fast: novelty must degrade toward zero (the
    // documented one-sided error) while fill_permille exposes why
    val input = MemoryStream[(String, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, String)]], spark.sqlContext)
    val q = NoveltyStream.monitor(
        input.toDF().toDF("source", "text"), numBits = 64, numProbes = 2)
      .writeStream.outputMode("append").format("memory").queryName("novelty_sat").start()
    try {
      (1 to 6).foreach { t =>
        input.addData(Seq(("s", (0 until 60).map(i => s"t${t}_w$i").mkString(" "))))
        q.processAllAvailable()
      }
      val rows = spark.sql("SELECT trigger, novelty_permille, fill_permille FROM novelty_sat ORDER BY trigger")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.last._3 >= 900L, s"64-bit filter should saturate: $rows")
      assert(rows.last._2 < rows.head._2,
        s"novelty must degrade (one-sided) as the filter saturates: $rows")
    } finally q.stop()
  }
}
