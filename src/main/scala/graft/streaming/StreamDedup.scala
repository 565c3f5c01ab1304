package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication for at-least-once pipelines.
  *
  * The forwarding engine is at-least-once (reference `README.md:10`): task
  * retries and redeliveries re-emit the same logical message with a new
  * physical offset, so downstream training-data ingest sees duplicates.
  * This operator drops them keyed on a logical identity — (topic,
  * partition, offset) for replays of the same physical record, or a content
  * fingerprint (`TextOps.q30/q34` style md5) for re-produced copies.
  *
  * Scale design: `dropDuplicatesWithinWatermark` keeps one state-store entry
  * per key only until the watermark passes it, so state is bounded by
  * (key arrival rate × watermark horizon) instead of growing forever the
  * way an unbounded `dropDuplicates` would. State lives in the HDFS/RocksDB
  * state store, partitioned by key hash — no driver-side memory.
  */
object StreamDedup {

  /** Drop rows whose `keys` were already seen within `delayThreshold` of
    * event time `eventTimeCol`. On a batch DataFrame (backfill over the
    * same tables) Spark rejects the watermark variant, so fall back to a
    * plain key dedup — same keys-kept set, no time bound needed since the
    * whole input is present at once. */
  def withinWatermark(df: DataFrame, eventTimeCol: String, delayThreshold: String,
                      keys: Seq[String]): DataFrame =
    if (df.isStreaming)
      df.withWatermark(eventTimeCol, delayThreshold)
        .dropDuplicatesWithinWatermark(keys)
    else df.dropDuplicates(keys)
}
