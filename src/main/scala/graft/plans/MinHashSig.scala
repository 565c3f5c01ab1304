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
 * multiply-shift updates per shingle, whole-stage-codegen'd.
 *
 * MinHash over a multiset equals MinHash over the set (min is idempotent),
 * so no distinct pass is needed. Per-function hashes derive from one base
 * rolling hash via the Dietzfelbinger multiply-shift family
 * (v = (mix * A_i + B_i) mod 2^64, A_i odd). Every constant is < 2^40 or
 * the operand is, so EVERY product fits a 128-bit integer: an independent
 * engine with int128 arithmetic (e.g. DuckDB HUGEINT, mod 2^64 after each
 * step) replays the signature bit-for-bit — that is what gives q41 its
 * exact SQL oracle. Values are masked to 63 bits so signed and unsigned
 * min agree across engines.
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

  /** Polynomial base: the 64-bit FNV prime (fits in 40 bits, so
    * h(<2^64) * P fits int128 — the oracle-replayability bound). */
  val P = 1099511628211L

  /** Independent odd 40-bit multipliers for the multiply-shift family
    * (fixed seeds: splitmix64 of the function index — deterministic across
    * runs). 40 bits keeps mix(<2^64) * A_i inside int128. */
  private[graft] val Multipliers: Array[Long] = Array.tabulate(64) { i =>
    (splitmix64(0x9e3779b97f4a7c15L * (i + 1)) & 0xffffffffffL) | 1L
  }

  /** 63-bit increments (non-negative, so they are plain SQL literals). */
  private[graft] val Increments: Array[Long] = Array.tabulate(64) { i =>
    splitmix64(0xbf58476d1ce4e5b9L * (i + 1)) & Long.MaxValue
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One-pass k-gram MinHash signature over raw UTF-8 bytes. Called from
    * generated code — keep it a static-shaped JVM method.
    *
    * Per window: h = Σ b[j]·P^(k-1-j) mod 2^64 (rolling), mix = h ^ (h>>>31),
    * v_i = ((mix · A_i + B_i) mod 2^64) & Long.MaxValue, sig_i = min v_i.
    * A doc shorter than k hashes its whole content as the single window
    * (n = 0 ⇒ h = 0), so equal short docs still collide. */
  def signature(bytes: Array[Byte], k: Int, numHashes: Int): Array[Long] = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = bytes.length

    @inline def absorb(h: Long): Unit = {
      val m = h ^ (h >>> 31)
      var i = 0
      while (i < numHashes) {
        val v = (m * Multipliers(i) + Increments(i)) & Long.MaxValue
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }

    if (n < k) {
      var h = 0L
      var pos = 0
      while (pos < n) { h = h * P + (bytes(pos) & 0xffL); pos += 1 }
      absorb(h)
      return sig
    }
    var pk = 1L // P^(k-1)
    var j = 1
    while (j < k) { pk *= P; j += 1 }
    var h = 0L
    var pos = 0
    while (pos < n) {
      h = h * P + (bytes(pos) & 0xffL)
      if (pos >= k) h -= pk * P * (bytes(pos - k) & 0xffL)
      if (pos >= k - 1) absorb(h)
      pos += 1
    }
    sig
  }

  /** Column API. */
  def minhash_sig(c: Column, k: Int = 5, numHashes: Int = 32): Column =
    Shims.column(MinHashSig(Shims.expression(c), k, numHashes))
}
