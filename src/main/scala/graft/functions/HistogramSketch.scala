package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * `hist_sketch(bucketCol)`: an exact bucket→count histogram over a long
 * bucket column, as a merge-invariant typed Aggregator — the building
 * block that lets a chi-square (or any histogram statistic) ride a SINGLE
 * streaming aggregation. Structured Streaming forbids cascading two
 * aggregations (per-bucket counts, then a per-group rollup); folding the
 * whole histogram into one bounded buffer turns the cascade into
 * groupBy(window, group).agg(hist_sketch(bucket)) + a stateless
 * projection for the statistic.
 *
 * Buffer layout: interleaved [bucket0, cnt0, bucket1, cnt1, ...] sorted
 * ascending by bucket (the [[MisraGries]] layout), so reduce is a binary
 * search + in-place bump and merge is a merge-join with count addition —
 * exact under any partitioning and merge order.
 *
 * State bound: the buffer holds one entry per DISTINCT BUCKET, so the
 * caller must feed a bounded bucket domain — clamp upstream (e.g.
 * `least(bucket, lit(maxBucket))`) exactly as the drift monitor's
 * value-decile bucketing does. This is a histogram over a declared value
 * domain, not a sketch of an unbounded key space ([[MisraGries]] is the
 * tool for that); `MaxEntries` fails loudly rather than degrade silently
 * if the precondition is broken.
 *
 * Precondition: non-null input (the primitive Long encoder folds NULL to
 * 0L silently — filter upstream, as [[MisraGries]] documents).
 */
class HistogramSketch extends Aggregator[Long, Array[Long], Map[Long, Long]] {
  import HistogramSketch.MaxEntries

  def zero: Array[Long] = Array.emptyLongArray

  /** binary search over even (bucket) slots; returns entry index or -(ins)-1 */
  private def find(buf: Array[Long], key: Long): Int = {
    var lo = 0
    var hi = buf.length / 2 - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mk = buf(mid * 2)
      if (mk == key) return mid
      else if (mk < key) lo = mid + 1
      else hi = mid - 1
    }
    -lo - 1
  }

  def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val idx = find(buf, v)
    if (idx >= 0) { buf(idx * 2 + 1) += 1; return buf }
    require(buf.length / 2 < MaxEntries,
      s"hist_sketch exceeded $MaxEntries distinct buckets — clamp the bucket domain upstream")
    val at = (-idx - 1) * 2
    val next = new Array[Long](buf.length + 2)
    System.arraycopy(buf, 0, next, 0, at)
    next(at) = v
    next(at + 1) = 1L
    System.arraycopy(buf, at, next, at + 2, buf.length - at)
    next
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val merged = new Array[Long](a.length + b.length)
    var ia = 0; var ib = 0; var out = 0
    while (ia < a.length && ib < b.length) {
      if (a(ia) == b(ib)) {
        merged(out) = a(ia); merged(out + 1) = a(ia + 1) + b(ib + 1)
        ia += 2; ib += 2
      } else if (a(ia) < b(ib)) {
        merged(out) = a(ia); merged(out + 1) = a(ia + 1); ia += 2
      } else {
        merged(out) = b(ib); merged(out + 1) = b(ib + 1); ib += 2
      }
      out += 2
    }
    while (ia < a.length) { merged(out) = a(ia); merged(out + 1) = a(ia + 1); ia += 2; out += 2 }
    while (ib < b.length) { merged(out) = b(ib); merged(out + 1) = b(ib + 1); ib += 2; out += 2 }
    require(out / 2 <= MaxEntries,
      s"hist_sketch exceeded $MaxEntries distinct buckets — clamp the bucket domain upstream")
    if (out == merged.length) merged else java.util.Arrays.copyOf(merged, out)
  }

  def finish(buf: Array[Long]): Map[Long, Long] = {
    val b = Map.newBuilder[Long, Long]
    var i = 0
    while (i < buf.length) { b += buf(i) -> buf(i + 1); i += 2 }
    b.result()
  }

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
}

object HistogramSketch {
  /** hard bound on distinct buckets per group — 64 KB of longs per state
    * row at worst; breaking it is a caller bug (unclamped domain) */
  val MaxEntries = 4096

  def hist_sketch(c: Column): Column = udaf(new HistogramSketch).apply(c)
}
