package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/**
 * Live filter-threshold calibration — the streaming twin of batch q139
 * (operators/TextOps.scala): as documents arrive, each source's quality
 * cutoff re-derives from the ACCUMULATED score distribution, so the
 * pipeline's "keep the best ~60%" filter tracks distribution drift
 * instead of running on last night's threshold. A source whose crawl
 * quality shifts mid-ingest gets a shifted cutoff the same trigger.
 *
 * Why the state is bounded: the score is an integer token-density
 * permille (q139's formula), so its value domain is ~[0, 1000+] — the
 * per-source histogram lives in a MapState keyed by SCORE, bounded by
 * the value domain, never by traffic. Each trigger touches only the
 * arriving scores' entries (one put per distinct arriving score) and
 * re-derives the threshold by scanning the ≤~1001-entry histogram —
 * O(domain), not O(documents). After any prefix of triggers the emitted
 * threshold equals batch q139 over exactly the documents fed so far
 * (stream ≡ batch, the spec pins it).
 */
object CalibrationStream {

  /** One scored document (post-score input row). */
  final case class ScoreIn(source: String, score: Long)

  /** Per (source, trigger) calibration report — q139's output columns
    * plus the trigger sequence. */
  final case class ThresholdRow(
      source: String, trigger: Long, threshold: Long,
      accepted_docs: Long, total_docs: Long, acceptance_permille: Long)

  /** q139's integer token-density score, computed live (n_chars =
    * length(text) — identical to the stored column for any corpus whose
    * n_chars is the text length, which the canonical tables satisfy). */
  def score(df: DataFrame): DataFrame =
    df.withColumn("tk",
        graft.plans.WsTokenCount.ws_token_count(col("text")).cast("long"))
      .select(col("source"),
        expr("tk * 1000 DIV greatest(CAST(length(text) AS BIGINT), 1L)").as("score"))

  /** Calibrate per source over `docs` (columns: source, text). Requires
    * the RocksDB state store provider, like every transformWithState op. */
  def monitor(docs: DataFrame, targetPermille: Long): Dataset[ThresholdRow] = {
    require(targetPermille >= 1 && targetPermille <= 1000,
      s"target must be in [1, 1000] permille, got $targetPermille")
    val spark = docs.sparkSession
    import spark.implicits._
    score(docs).as[ScoreIn]
      .groupByKey(_.source)
      .transformWithState(new Processor(targetPermille), TimeMode.None(), OutputMode.Append())
  }

  final class Processor(targetPermille: Long)
      extends StatefulProcessor[String, ScoreIn, ThresholdRow] {

    @transient private var hist: MapState[Long, Long] = _
    @transient private var trig: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      hist = getHandle.getMapState[Long, Long](
        "hist", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      trig = getHandle.getValueState[Long]("trig", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[ScoreIn],
        timerValues: TimerValues): Iterator[ThresholdRow] = {
      // batch-local pre-aggregation: ONE state put per distinct arriving
      // score, not one per document
      val arriving = scala.collection.mutable.Map.empty[Long, Long]
      var n = 0L
      rows.foreach { r => arriving(r.score) = arriving.getOrElse(r.score, 0L) + 1L; n += 1 }
      if (n == 0) return Iterator.empty
      arriving.foreach { case (s, c) =>
        hist.updateValue(s, (if (hist.containsKey(s)) hist.getValue(s) else 0L) + c)
      }
      // q139's selection over the accumulated histogram: descending
      // cumulative, largest score whose acceptance still meets the target
      val entries = hist.iterator().toSeq.sortBy(-_._1)
      val total = entries.iterator.map(_._2).sum
      var cum = 0L
      var threshold = Long.MinValue
      var accepted = 0L
      val it = entries.iterator
      var found = false
      while (it.hasNext && !found) {
        val (s, c) = it.next()
        cum += c
        if (cum * 1000L >= targetPermille * total) {
          threshold = s; accepted = cum; found = true
        }
      }
      val t = (if (trig.exists()) trig.get() else 0L) + 1L
      trig.update(t)
      Iterator.single(ThresholdRow(key, t, threshold, accepted, total,
        accepted * 1000L / total))
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ThresholdRow] = Iterator.empty
  }
}
