package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * `smallest_k(col, k)`: the k smallest distinct values of a long column,
 * sorted ascending — a bounded-state typed Aggregator.
 *
 * Built for LSH bucket materialization: a bucket's candidate pairs come
 * from the sorted id list, and a bucket with MORE than `cap` members is
 * degenerate (ubiquitous-shingle buckets produce n²/2 candidate pairs with
 * no near-dup signal). Aggregating with k = cap+1 keeps reducer state
 * bounded at k longs — unlike collect_list, which materializes the whole
 * bucket before any size filter can run and is exactly what OOMs a reducer
 * on a 100 TB corpus with a pathological hot bucket — while still proving
 * overflow: a result of length cap+1 means "more than cap members", which
 * the caller drops.
 *
 * State invariant: the buffer is ALWAYS sorted ascending with distinct
 * values and length ≤ k. That makes the O(1) fast-reject against the last
 * element sound — a lazily-appended buffer would let a duplicate occupy
 * position k-1 and wrongly reject values that belong in the k smallest
 * (k=4 over [1,2,3,2,4] must keep 4). Accepted inserts cost O(k) memmove,
 * but once the sketch is full only values below the current k-th minimum
 * pay it (probability ~k/n for random streams), so the steady-state
 * per-row cost is the rejection comparison.
 */
class SmallestK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 1, s"smallest_k needs k >= 1, got $k")

  def zero: Array[Long] = Array.emptyLongArray

  /** Keep the k smallest DISTINCT values of an arbitrary array (merge
    * path — inputs are each sorted-distinct but their concat is not). */
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

  def reduce(buf: Array[Long], v: Long): Array[Long] = {
    // sound ONLY because buf is sorted-distinct: full ⇒ k distinct ≤ last
    if (buf.length == k && v >= buf(k - 1)) return buf
    val idx = java.util.Arrays.binarySearch(buf, v)
    if (idx >= 0) return buf // duplicate
    val at = -idx - 1 // insertion point
    val n = math.min(buf.length + 1, k)
    val next = new Array[Long](n)
    System.arraycopy(buf, 0, next, 0, at)
    next(at) = v
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

  def finish(buf: Array[Long]): Array[Long] = trim(buf)

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object SmallestK {
  def smallest_k(c: Column, k: Int): Column = udaf(new SmallestK(k)).apply(c)
}
