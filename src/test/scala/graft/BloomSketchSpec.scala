package graft

import graft.functions.BloomSketch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val Bits = 1 << 14
  private val Probes = 5

  test("no false negatives: every inserted key passes mightContain") {
    // 60-bit-ish keys like the md5-prefix digests the operators feed it
    val keys = (0 until 2000).map(i => (i.toLong * 0x5DEECE66DL + 11L) & 0xFFFFFFFFFFFFFFL)
    val df = keys.toDF("h")
    val bloom = df.agg(BloomSketch.bloom_agg(col("h"), Bits, Probes).as("bits"))
    val hits = df.join(broadcast(bloom))
      .filter(BloomSketch.mightContain("bits", "h", Bits, Probes))
      .count()
    assert(hits == keys.size, "bloom dropped an inserted key")
  }

  test("false-positive rate is near theory, not degenerate") {
    val n = 2000
    val inserted = (0 until n).map(i => (i.toLong * 0x5DEECE66DL + 11L) & 0xFFFFFFFFFFFFFFL)
    val probes = (0 until 20000).map(i => (i.toLong * 0x9E3779B9L + 0xABCDEFL) & 0xFFFFFFFFFFFFFFL)
      .filterNot(inserted.toSet)
    val bloom = inserted.toDF("h").agg(BloomSketch.bloom_agg(col("h"), Bits, Probes).as("bits"))
    val fp = probes.toDF("h").join(broadcast(bloom))
      .filter(BloomSketch.mightContain("bits", "h", Bits, Probes))
      .count()
    val rate = fp.toDouble / probes.size
    // theory at m/n=8.2, k=5: ~2.2%; any partition-order effect or probe
    // mismatch sends this to ~100% (all-ones) or breaks no-false-negatives
    assert(rate < 0.1, s"false-positive rate $rate is degenerate")
  }

  test("merge is order-independent: 1 partition == 8 partitions") {
    val keys = (0 until 5000).map(i => (i.toLong * 1234567L) & 0xFFFFFFFFFFFFFFL)
    def bits(parts: Int): Seq[Long] =
      keys.toDF("h").repartition(parts)
        .agg(BloomSketch.bloom_agg(col("h"), Bits, Probes).as("bits"))
        .head().getSeq[Long](0)
    assert(bits(1) == bits(8))
  }

  test("SQL probe replay matches the JVM probeBit exactly") {
    val keys = Seq(0L, 1L, 12345L, (1L << 60) - 1, 0x123456789ABCDEL)
    val jvm = keys.map(k => (0 until Probes).map(i => BloomSketch.probeBit(k, i, Bits)))
    // membership in a filter containing ONLY that key requires every SQL
    // probe bit to equal a JVM-set bit; with 5 probes over 2^14 bits a
    // mismatch in any probe fails with overwhelming probability
    keys.zip(jvm).foreach { case (k, _) =>
      val one = Seq(k).toDF("h")
      val bloom = one.agg(BloomSketch.bloom_agg(col("h"), Bits, Probes).as("bits"))
      val n = one.join(broadcast(bloom))
        .filter(BloomSketch.mightContain("bits", "h", Bits, Probes)).count()
      assert(n == 1, s"SQL probes diverge from JVM probes for key $k")
    }
  }

  test("ANSI mode: membership expression never overflows on 60-bit keys") {
    val edge = Seq(0L, (1L << 60) - 1, (1L << 59) + 12345L).toDF("h")
    val bloom = edge.agg(BloomSketch.bloom_agg(col("h"), Bits, Probes).as("bits"))
    // would throw ARITHMETIC_OVERFLOW under ANSI if any product escaped i64
    assert(edge.join(broadcast(bloom))
      .filter(BloomSketch.mightContain("bits", "h", Bits, Probes)).count() == 3)
  }
}
