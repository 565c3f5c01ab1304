package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/**
 * Streaming sequence packing — the live form of q63
 * (operators/TextOps.scala): arriving documents pack into fixed
 * token-budget training sequences per source under the SAME rule as the
 * batch operator (a document belongs to the sequence where its running
 * token total STARTS, so a straddling document stays whole and the
 * stream never needs to split or buffer text), with the running total
 * carried across triggers and restarts in ONE ValueState per source.
 *
 * This is what a continuous pretraining-data pipeline runs between
 * curation and the trainer: documents stream in curated order and leave
 * stamped with (sequence index, offset) so downstream shuffling/writing
 * can group physical sequences without ever re-scanning history —
 * state is O(sources), independent of traffic, and the emitted
 * assignment for a document never changes once produced (append mode).
 *
 * Within a trigger, rows of one source process in doc_id order, so a
 * replay that re-batches the same ordered feed differently produces
 * byte-identical assignments — the restart contract the spec pins.
 */
object PackStream {

  /** A curated document entering the packer. */
  final case class Doc(source: String, docId: Long, tokens: Long)

  /** The document's sequence assignment: `seqIdx` is the training
    * sequence, `startOff` the document's token offset inside it (may
    * exceed the budget only for the straddling tail of a document that
    * started in-budget, exactly like the batch rule). */
  final case class Packed(
      source: String, docId: Long, tokens: Long, seqIdx: Long, startOff: Long)

  /** Running token total per source (ValueState). */
  final case class Fill(cum: Long)

  /** Pack `docs` into `budget`-token sequences per source. Requires the
    * RocksDB state store provider, like every transformWithState op. */
  def pack(docs: Dataset[Doc], budget: Long): Dataset[Packed] = {
    require(budget > 0, "token budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new Processor(budget), TimeMode.None(), OutputMode.Append())
  }

  final class Processor(budget: Long)
      extends StatefulProcessor[String, Doc, Packed] {

    @transient private var fill: ValueState[Fill] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      fill = getHandle.getValueState[Fill](
        "fill", Encoders.product[Fill], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Packed] = {
      var cum = if (fill.exists()) fill.get().cum else 0L
      val out = Seq.newBuilder[Packed]
      // doc_id order within the trigger: assignment is then independent
      // of how the ordered feed was batched
      rows.toSeq.sortBy(_.docId).foreach { d =>
        out += Packed(key, d.docId, d.tokens, cum / budget, cum % budget)
        cum += d.tokens
      }
      fill.update(Fill(cum))
      out.result().iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Packed] = Iterator.empty
  }
}
