package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/**
 * Delayed-visibility gate as a `transformWithState` operator with
 * EVENT-TIME TIMERS — the live form of the reference's retry-tier delay:
 * `KafkaDelayProcessManager` pauses a partition whose head record is not
 * yet due (`record.timestamp + processing_delay_ms > now`,
 * KafkaDelayProcessManager.java:53-61) and resumes it when the delay
 * elapses, merging the buffered records back into the poll stream
 * (AbstractKafkaFetcherThread.java:449-490).
 *
 * The Spark-native translation: records ride in with their Kafka
 * timestamp; each (topic, partition) key buffers not-yet-due records in a
 * MapState keyed by DUE time and registers ONE timer per distinct due
 * instant. When the watermark passes a due time the timer fires and that
 * bucket — exactly the records that became visible — is emitted and
 * deleted. Nothing re-scans the buffer per trigger (the
 * `delayGateSql` batch gate re-filters every trigger); state-store traffic
 * is O(arrivals + releases), and capacity is bounded by delay × arrival
 * rate per partition, the same bound the reference's pause gives.
 *
 * Late-data interaction: in event-time mode the engine's watermark filter
 * drops records whose timestamp is behind the watermark BEFORE they reach
 * this operator. That is the correct contract for the retry path — the
 * reference re-produces every retry with a fresh physical timestamp
 * (ProcessorMessage wrap, retry counters bumped), so a gated record is
 * never older than the stream that carries it; a disabled gate
 * (delayMs = 0) releases each record as soon as the watermark reaches its
 * timestamp — same trigger when the operator-visible watermark allows,
 * the next otherwise.
 */
object DelayGateTws {

  /** A delayed record: the Kafka coordinates + event-time millis. */
  final case class DelayedRecord(
      topic: String, partition: Int, offset: Long, eventTimeMs: Long)

  /** Input row after the watermark column is attached. */
  final case class Timestamped(
      topic: String, partition: Int, offset: Long, eventTimeMs: Long,
      eventTime: java.sql.Timestamp)

  /** A record released by the gate at its visibility instant. */
  final case class Released(
      topic: String, partition: Int, offset: Long, dueMs: Long)

  /** Offsets sharing one due instant (MapState value). */
  final case class Bucket(offsets: Seq[Long])

  /** Gate `records` by `delayMs` of post-timestamp invisibility.
    * `watermarkDelay` is the out-of-orderness allowance of the source
    * (0 seconds for in-order Kafka partitions). Requires the RocksDB state
    * store provider, like every transformWithState op. */
  def gate(
      records: Dataset[DelayedRecord],
      delayMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Released] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.toDF()
      .withColumn("eventTime", timestamp_millis(col("eventTimeMs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Timestamped]
      .groupByKey(r => (r.topic, r.partition))
      .transformWithState(new Processor(delayMs), TimeMode.EventTime(), OutputMode.Append())
  }

  final class Processor(delayMs: Long)
      extends StatefulProcessor[(String, Int), Timestamped, Released] {

    @transient private var buckets: MapState[Long, Bucket] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buckets = getHandle.getMapState[Long, Bucket](
        "buckets", Encoders.scalaLong, Encoders.product[Bucket], TTLConfig.NONE)

    override def handleInputRows(
        key: (String, Int),
        rows: Iterator[Timestamped],
        timerValues: TimerValues): Iterator[Released] = {
      val wm = timerValues.getCurrentWatermarkInMs
      val out = Seq.newBuilder[Released]
      rows.foreach { r =>
        val due = r.eventTimeMs + delayMs
        if (due <= wm) {
          // already visible: pass through, no state touched. With
          // delayMs > 0 this is unreachable — the event-time late filter
          // upstream admits only eventTime >= watermark, so due =
          // eventTime + delay > wm — but delayMs = 0 (a disabled gate)
          // flows records straight through here
          out += Released(r.topic, r.partition, r.offset, due)
        } else if (buckets.containsKey(due)) {
          // a timer for this instant already exists — extend its bucket
          buckets.updateValue(due, Bucket(buckets.getValue(due).offsets :+ r.offset))
        } else {
          buckets.updateValue(due, Bucket(Seq(r.offset)))
          getHandle.registerTimer(due) // one timer per distinct due instant
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        key: (String, Int),
        timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Released] = {
      val due = expired.getExpiryTimeInMs
      if (!buckets.containsKey(due)) Iterator.empty
      else {
        val offs = buckets.getValue(due).offsets
        buckets.removeKey(due)
        offs.sorted.iterator.map(o => Released(key._1, key._2, o, due))
      }
    }
  }
}
