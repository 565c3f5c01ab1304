package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/**
 * Live novelty monitor — the streaming twin of batch q138
 * (operators/TextOps.scala): per trigger and source, what fraction of the
 * arriving distinct 3-gram types has never been seen on this stream
 * before? A crawl increment that merely re-fetches mirrors shows its
 * novelty collapse WHILE it ingests, instead of after the nightly q138
 * replay; a healthy new source holds high novelty for many triggers.
 *
 * Why a Bloom filter on the live path: "seen before" is a MEMBERSHIP
 * question over every gram type ever ingested — exact state is unbounded
 * by design (novel grams keep arriving; that is the metric). One
 * fixed-size Bloom bit array per source bounds state at m/8 bytes
 * regardless of history, reusing [[graft.functions.BloomSketch]]'s
 * double-hash probe arithmetic (same bits, same probe positions as the
 * batch decontamination path). The error is ONE-SIDED and conservative
 * for alarming: a false positive calls a novel gram "seen", so reported
 * novelty is a LOWER bound — the monitor can only under-claim novelty,
 * never invent it, and an under-saturated filter (fill ≪ m) is exact.
 * The emitted fill_permille says how far from saturation the filter is,
 * so the operator knows when the bound has slack.
 *
 * Dataflow: gram hashing is stateless map-side column work (the q138
 * gram definition verbatim); the ONLY stateful op keys by source and
 * round-trips one bit array + one counter row per source per trigger —
 * state is O(sources × m/8), independent of traffic.
 */
object NoveltyStream {

  /** One gram-hash observation (post-explode input row). */
  final case class GramIn(source: String, h: Long)

  /** Per (source, trigger) novelty report. `trigger` is a per-source
    * sequence number carried in state (not a wall clock — replays
    * reproduce it). */
  final case class NoveltyRow(
      source: String, trigger: Long, types_seen: Long, types_novel: Long,
      novelty_permille: Long, cum_novel: Long, fill_permille: Long)

  /** Bloom words + per-source counters (ValueState). */
  final case class Hist(bits: Array[Long], trigger: Long, cumNovel: Long, setBits: Long)

  /** 60-bit gram digests for `text`, q138's gram definition: lowercased
    * whitespace tokens, 3-gram, md5 → first 15 hex digits. `carry` names
    * extra input columns to keep on the output (e.g. the event-time
    * column, so a funnel stage can watermark the gram stream). */
  def gramHashes(df: DataFrame, carry: Seq[String] = Nil): DataFrame =
    df.withColumn("toks",
        graft.plans.TextKernels.ws_tokens(lower(col("text"))))
      .filter(size(col("toks")) >= 3)
      .select(col("source") +: carry.map(col) :+ explode(transform(
        graft.plans.TextKernels.ws_grams(col("toks"), 3),
        g => graft.plans.TextKernels.md5_prefix60(g))).as("h"): _*)

  /** Monitor novelty per source over `docs` (columns: source, text).
    * `numBits` must be a positive multiple of 64. Requires the RocksDB
    * state store provider, like every transformWithState op. */
  def monitor(docs: DataFrame, numBits: Int, numProbes: Int): Dataset[NoveltyRow] = {
    require(numBits >= 64 && numBits % 64 == 0, s"numBits must be a multiple of 64, got $numBits")
    val spark = docs.sparkSession
    import spark.implicits._
    gramHashes(docs).as[GramIn]
      .groupByKey(_.source)
      .transformWithState(new Processor(numBits, numProbes), TimeMode.None(), OutputMode.Append())
  }

  final class Processor(numBits: Int, numProbes: Int)
      extends StatefulProcessor[String, GramIn, NoveltyRow] {

    @transient private var hist: ValueState[Hist] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getValueState[Hist](
        "hist", Encoders.product[Hist], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[GramIn],
        timerValues: TimerValues): Iterator[NoveltyRow] = {
      val h0 =
        if (hist.exists()) hist.get()
        else Hist(new Array[Long](numBits / 64), 0L, 0L, 0L)
      val bits = h0.bits
      var setBits = h0.setBits
      // the trigger's distinct gram types (batch-local exact dedup — the
      // same work the batch replay does, bounded by the trigger's volume)
      val types = new java.util.TreeSet[Long]()
      rows.foreach(r => types.add(r.h))
      // SORTED iteration: which gram "wins" an intra-trigger bit collision
      // must not depend on hash-set order, or replays of the same feed
      // could report different novelty counts
      var novel = 0L
      val it = types.iterator()
      while (it.hasNext) {
        val v = it.next()
        var isNew = false
        var i = 0
        while (i < numProbes) {
          val bit = graft.functions.BloomSketch.probeBit(v, i, numBits)
          val w = bit >>> 6
          val m = 1L << (bit & 63)
          if ((bits(w) & m) == 0L) { isNew = true; bits(w) |= m; setBits += 1 }
          i += 1
        }
        if (isNew) novel += 1
      }
      val trigger = h0.trigger + 1
      val cum = h0.cumNovel + novel
      hist.update(Hist(bits, trigger, cum, setBits))
      val seen = types.size().toLong
      if (seen == 0) Iterator.empty
      else Iterator.single(NoveltyRow(key, trigger, seen, novel,
        novel * 1000L / seen, cum, setBits * 1000L / numBits))
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[NoveltyRow] = Iterator.empty
  }
}
