package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `minhash_sig(text)`: the n-function MinHash signature of a document's
 * character k-gram shingle set, computed in ONE pass over the UTF-8 bytes
 * with a rolling polynomial hash — no shingle arrays are materialized, no
 * per-element closures run.
 *
 * Why custom: the composable formulation
 * (`transform(sequence(...), i -> substring(...))` → 32 ×
 * `array_min(transform(sh, x -> xxhash64(x, i)))`) allocates ~len strings
 * per document and walks the shingle array 32 times on the interpreted
 * higher-order-function path. For LSH dedup over billions of documents the
 * signature computation IS the scan cost. This expression is O(len) with 32
 * multiply-mix updates per shingle, whole-stage-codegen'd.
 *
 * MinHash over a multiset equals MinHash over the set (min is idempotent),
 * so no distinct pass is needed. Per-function hashes derive from one base
 * rolling hash via independent odd multipliers + murmur finalization —
 * the standard universal-hashing construction.
 */
case class MinHashSig(child: Expression, k: Int = 5, numHashes: Int = 32)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires a string input, got ${child.dataType.simpleString}")
    else if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig shingle width k must be >= 1, got $k")
    else if (numHashes < 1 || numHashes > MinHashSig.Multipliers.length)
      // reject at analysis time — an out-of-range value would otherwise
      // throw per-row, hours into a scan
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig numHashes must be in [1, ${MinHashSig.Multipliers.length}], got $numHashes")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(MinHashSig.signature(bytes, k, numHashes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.MinHashSig.signature($c.getBytes(), $k, $numHashes))")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  /** Independent odd multipliers for the universal-hash family (fixed seeds:
    * splitmix64 of the function index — deterministic across runs). */
  private val Multipliers: Array[Long] = Array.tabulate(64) { i =>
    splitmix64(0x9e3779b97f4a7c15L * (i + 1)) | 1L
  }
  private val Increments: Array[Long] = Array.tabulate(64) { i =>
    splitmix64(0xbf58476d1ce4e5b9L * (i + 1))
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** murmur3 fmix64 finalizer — avalanches the rolling polynomial. */
  @inline private def fmix64(in: Long): Long = {
    var h = in
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** One-pass k-gram MinHash signature over raw UTF-8 bytes. Called from
    * generated code — keep it a static-shaped JVM method. */
  def signature(bytes: Array[Byte], k: Int, numHashes: Int): Array[Long] = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = bytes.length
    if (n < k) {
      // degenerate doc: hash the whole content once so the signature is
      // still defined and equal docs still collide
      val base = fmix64(java.util.Arrays.hashCode(bytes).toLong)
      var i = 0
      while (i < numHashes) {
        sig(i) = base * Multipliers(i) + Increments(i)
        i += 1
      }
      return sig
    }
    // rolling polynomial over a window of k bytes: h = sum b[j] * P^(k-1-j)
    val P = 1099511628211L // FNV prime as the polynomial base
    var pk = 1L // P^(k-1)
    var j = 1
    while (j < k) { pk *= P; j += 1 }
    var h = 0L
    var pos = 0
    while (pos < n) {
      h = h * P + (bytes(pos) & 0xffL)
      if (pos >= k) h -= pk * P * (bytes(pos - k) & 0xffL)
      if (pos >= k - 1) {
        val base = fmix64(h)
        var i = 0
        while (i < numHashes) {
          val v = base * Multipliers(i) + Increments(i)
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      pos += 1
    }
    sig
  }

  /** Column API. */
  def minhash_sig(c: Column, k: Int = 5, numHashes: Int = 32): Column =
    Shims.column(MinHashSig(Shims.expression(c), k, numHashes))
}
