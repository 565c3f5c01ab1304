package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * K-minimum-values (KMV) distinct-count sketch as a typed `Aggregator`
 * (registered via `functions.udaf`), the engine's approximate-uniq audit
 * primitive (AUDIT_TYPE_APPROX_UNIQ is spec-only in the reference:
 * /root/reference/idl/src/main/proto/data/kafka/data-transfer/job.proto:313-334).
 *
 * Why KMV instead of `approx_count_distinct`: HLL implementations differ
 * across engines by design, so an HLL estimate can never be cross-checked
 * by an independent oracle. KMV over an explicit hash column is exactly
 * reproducible anywhere that can sort integers: the estimate is a pure
 * function of the k smallest distinct hash values, so DuckDB running plain
 * SQL over the same md5-derived hashes produces the bit-identical double.
 *
 * Scale design: state is a bounded array (≤ k longs — k=256 ⇒ 2 KiB), so
 * partial aggregation combines map-side like any sum; no per-key sort of
 * the full data, no unbounded collect_set. The buffer invariant is
 * sorted-distinct (see [[SmallestK]] — a lazily-appended buffer makes the
 * fast-reject threshold unsound under duplicate inputs, and hash streams
 * ARE duplicate-heavy); once the sketch fills, non-qualifying values
 * reject in O(1). Estimator: with fewer than k distinct hashes the sketch
 * is exhaustive (exact count); otherwise est = (k-1) * 2^60 / h_(k) for
 * 60-bit hashes (Bar-Yossef et al. 2002, "Counting distinct elements in a
 * data stream").
 */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  /** Hash domain: callers feed 60-bit hashes (15 hex chars of md5) so the
    * same values are exactly representable in engines lacking u64. */
  val HashSpan: Double = 1152921504606846976.0d // 2^60

  def zero: Array[Long] = Array.emptyLongArray

  /** Keep the k smallest DISTINCT values of an arbitrary array (merge
    * path — sorted-distinct inputs, unsorted concat). */
  private def trim(buf: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(buf)
    var out = 0
    var i = 0
    while (i < buf.length && out < k) {
      if (out == 0 || buf(i) != buf(out - 1)) { buf(out) = buf(i); out += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(buf, out)
  }

  def reduce(buf: Array[Long], h: Long): Array[Long] = {
    // sound ONLY because buf is sorted-distinct: full ⇒ k distinct ≤ last
    if (buf.length == k && h >= buf(k - 1)) return buf
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) return buf // duplicate
    val at = -idx - 1
    val n = math.min(buf.length + 1, k)
    val next = new Array[Long](n)
    System.arraycopy(buf, 0, next, 0, at)
    next(at) = h
    System.arraycopy(buf, at, next, at + 1, n - at - 1)
    next
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val both = new Array[Long](a.length + b.length)
    System.arraycopy(a, 0, both, 0, a.length)
    System.arraycopy(b, 0, both, a.length, b.length)
    trim(both)
  }

  def finish(buf: Array[Long]): Double = {
    val m = trim(buf)
    if (m.length < k) m.length.toDouble
    else (k - 1).toDouble * HashSpan / m(k - 1).toDouble
  }

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvSketch {
  /** `kmv_estimate(hashCol)`: approximate distinct count of a 60-bit hash
    * column, k=256 (≈6% standard error). */
  def kmv_estimate(c: Column, k: Int = 256): Column = udaf(new KmvSketch(k)).apply(c)
}
