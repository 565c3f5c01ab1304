package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * `bloom_agg(col, numBits, numProbes)`: a Bloom filter over a long key
 * column, built as a typed Aggregator whose buffer is a fixed-size long
 * array (numBits/64 words) regardless of input cardinality, merged by
 * bitwise OR — fully map-side-combinable, so building the filter over N
 * partitions shuffles numBits/8 bytes per partition, never the keys.
 *
 * Probe positions use Kirsch-Mitzenmacher double hashing (h1 + i*h2 mod m)
 * over the SAME integer arithmetic exposed by `probeBitsSql`, so membership
 * can be tested either engine-side (a codegen'd SQL expression over the
 * broadcast bits array — see q66) or in any other engine that can replay
 * the arithmetic. No java.util.Random, no platform hashing — a key's probe
 * set is a pure function of (key, numBits, numProbes).
 *
 * Role at 100 TB (the decontamination / membership-join move): the filter
 * over a benchmark key set is orders of magnitude smaller than the key set
 * itself (10 bits/key at 1% FP vs >=8 bytes/key), so it broadcasts where
 * the exact set would not; the corpus-side scan drops non-members without
 * any shuffle, and only the surviving sliver pays the exact verification
 * join. False positives are removed by that exact join; false negatives
 * cannot occur, so the two-phase result is exact.
 *
 * The reference ships no sketch structures (its dedup is the offset-keyed
 * ack queue, AckTrackingQueue.java:42-133); this extends the engine the
 * same way q64's Misra-Gries does: bounded state + exact verification.
 */
class BloomSketch(numBits: Int, numProbes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits >= 64 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numProbes >= 1, s"numProbes must be >= 1, got $numProbes")

  private val words = numBits / 64

  def zero: Array[Long] = new Array[Long](words)

  def reduce(buf: Array[Long], v: Long): Array[Long] = {
    var i = 0
    while (i < numProbes) {
      val bit = BloomSketch.probeBit(v, i, numBits)
      buf(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomSketch {
  // murmur3/xxhash-style 32-bit odd mixing constants; with 30-bit key
  // halves every product stays below 2^63, so the arithmetic never
  // overflows a signed 64-bit int — required because the SQL replay runs
  // under ANSI semantics (overflow throws) while the JVM would wrap
  private val C1 = 2246822507L // 0x85EBCA6B
  private val C2 = 3266489917L // 0xC2B2AE35
  private val C3 = 668265263L // 0x27D4EB2F
  private val C4 = 2654435769L // 0x9E3779B9

  /** Double-hash probe i for key v (expects v in [0, 2^60), e.g. a 60-bit
    * md5 prefix): bit_i = (h1 + i*((h2 % m)|1)) % m with h1,h2 mixes of
    * the key's 30-bit halves. Every intermediate is non-negative and
    * < 2^63 — overflow-free in Java AND ANSI SQL, so [[probeSql]] replays
    * this exactly. */
  def probeBit(v: Long, i: Int, numBits: Int): Int = {
    val lo = v & 0x3FFFFFFFL
    val hi = v >>> 30
    val h1 = hi * C1 + lo * C2
    val h2 = hi * C3 + lo * C4
    ((h1 % numBits + i * ((h2 % numBits) | 1L)) % numBits).toInt
  }

  /** SQL fragment (Spark dialect) computing probe bit i of key column
    * `keyExpr` — same arithmetic as [[probeBit]]. */
  private def probeSql(keyExpr: String, i: Int, numBits: Int): String = {
    val h1 = s"(shiftrightunsigned($keyExpr, 30) * ${C1}L + ($keyExpr & 1073741823L) * ${C2}L)"
    val h2 = s"(shiftrightunsigned($keyExpr, 30) * ${C3}L + ($keyExpr & 1073741823L) * ${C4}L)"
    s"($h1 % ${numBits}L + ${i}L * (($h2 % ${numBits}L) | 1L)) % ${numBits}L"
  }

  /** Membership-test Column: true iff every probe bit of the key (SQL
    * expression `keyExpr`, ideally a materialized column so it isn't
    * re-evaluated per probe) is set in the bits array column (SQL
    * expression `bitsExpr`, array<bigint>, 1-indexed element_at). Pure
    * builtin functions — codegen-friendly, no UDF in the corpus scan. */
  def mightContain(bitsExpr: String, keyExpr: String, numBits: Int, numProbes: Int): Column = {
    val tests = (0 until numProbes).map { i =>
      val bit = probeSql(keyExpr, i, numBits)
      s"((element_at($bitsExpr, CAST(($bit) DIV 64 AS INT) + 1) >> (($bit) % 64)) & 1L) = 1L"
    }
    expr(tests.mkString("(", " AND ", ")"))
  }

  def bloom_agg(c: Column, numBits: Int, numProbes: Int): Column =
    udaf(new BloomSketch(numBits, numProbes)).apply(c)
}
