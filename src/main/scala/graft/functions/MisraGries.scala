package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * `mg_candidates(col, k)`: Misra-Gries heavy-hitter candidates over a long
 * key column — a bounded-state typed Aggregator whose buffer never exceeds
 * k (key, count) pairs, regardless of input cardinality.
 *
 * Guarantee (Misra & Gries 1982; merge rule from Agarwal et al.,
 * "Mergeability of Summaries", PODS 2012): every key with true frequency
 * > n/(k+1) is present in the final sketch, and sketch counts underestimate
 * true counts by at most n/(k+1). The output is therefore a *candidate
 * superset* of the heavy hitters; callers verify candidates with one exact
 * aggregation restricted (broadcast semi-join) to the candidate keys. The
 * two-phase result — candidates, then exact counts filtered by the
 * threshold — is deterministic and independent of partitioning/merge order
 * even though the intermediate sketch contents are not.
 *
 * This is the hot-key detector the forwarding plane needs at 100 TB: a full
 * `groupBy(key).count()` shuffles every distinct key; the sketch keeps k
 * longs per map task, merges associatively (map-side partial aggregation),
 * and the single final merge touches only (#partitions x k) entries.
 *
 * Buffer layout: interleaved [key0, cnt0, key1, cnt1, ...] sorted ascending
 * by key, so lookups are a binary search over even slots.
 *
 * Precondition: the input column must be non-null. The primitive Long input
 * encoder folds NULL to 0L silently, which would diverge from engines that
 * group NULL separately — filter nulls out first (as q64 does with
 * `filter(col.isNotNull)`) rather than relying on the encoder default.
 */
class MisraGries(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 1, s"mg_candidates needs k >= 1, got $k")

  def zero: Array[Long] = Array.emptyLongArray

  /** binary search over even (key) slots; returns entry index or -(ins)-1 */
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
    val entries = buf.length / 2
    if (entries < k) { // room: insert keeping key order
      val at = (-idx - 1) * 2
      val next = new Array[Long](buf.length + 2)
      System.arraycopy(buf, 0, next, 0, at)
      next(at) = v
      next(at + 1) = 1L
      System.arraycopy(buf, at, next, at + 2, buf.length - at)
      return next
    }
    // full and absent: the classic MG step — decrement every counter
    // (the new key's implicit count 1 decrements to 0 with them) and
    // compact out zeros in place
    var out = 0
    var i = 0
    while (i < entries) {
      if (buf(i * 2 + 1) > 1) {
        buf(out * 2) = buf(i * 2)
        buf(out * 2 + 1) = buf(i * 2 + 1) - 1
        out += 1
      }
      i += 1
    }
    if (out == entries) buf else java.util.Arrays.copyOf(buf, out * 2)
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    // merge-join the two key-sorted summaries, summing counts
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
    val entries = out / 2
    if (entries <= k) return java.util.Arrays.copyOf(merged, out)
    // over capacity: subtract the (k+1)-th largest count from every counter
    // and drop the non-positive — at most k survive, error grows by that
    // count, which the mergeability proof bounds within n/(k+1) overall
    val counts = new Array[Long](entries)
    var i = 0
    while (i < entries) { counts(i) = merged(i * 2 + 1); i += 1 }
    java.util.Arrays.sort(counts)
    val sub = counts(entries - (k + 1)) // (k+1)-th largest
    var o = 0
    i = 0
    while (i < entries) {
      if (merged(i * 2 + 1) > sub) {
        merged(o * 2) = merged(i * 2)
        merged(o * 2 + 1) = merged(i * 2 + 1) - sub
        o += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(merged, o * 2)
  }

  /** candidate keys, ascending (buffer is key-sorted already) */
  def finish(buf: Array[Long]): Array[Long] = {
    val keys = new Array[Long](buf.length / 2)
    var i = 0
    while (i < keys.length) { keys(i) = buf(i * 2); i += 1 }
    keys
  }

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MisraGries {
  def mg_candidates(c: Column, k: Int): Column = udaf(new MisraGries(k)).apply(c)
}
