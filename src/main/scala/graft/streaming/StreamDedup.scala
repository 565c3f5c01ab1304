package graft.streaming

import graft.functions.BloomSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{not, typedlit}

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

  /** Snapshot-aware streaming dedup — the live twin of the q110 batch
    * operator: arrivals whose 60-bit content digest (`keyCol`, long, e.g.
    * the md5-prefix digest q66/q67 use) probes positive against the
    * deduped SNAPSHOT's Bloom filter drop immediately; survivors then
    * dedup against each other within the watermark horizon.
    *
    * Scale design: the snapshot probe is a STATELESS codegen'd filter over
    * a broadcast literal of numBits/8 bytes — a billion-digest snapshot at
    * 10 bits/key is ~1.2 GB of state as an exact set but ~150 MB as bits,
    * and nothing per-arrival shuffles or lands in the state store for it;
    * only bloom-negative (i.e. genuinely new) arrivals pay watermark
    * state. Bloom false positives drop a ~FP-rate sliver of new docs
    * (no false negatives: a snapshot dup can never leak through) —
    * the right trade for ingest; where exact accounting matters, replay
    * the day's dropped digests through q110's exact join offline. */
  def againstSnapshot(df: DataFrame, eventTimeCol: String, delayThreshold: String,
                      keyCol: String, snapshotBits: Seq[Long], numProbes: Int): DataFrame = {
    val numBits = snapshotBits.size * 64
    val gated = df
      .withColumn("__snapshot_bits", typedlit(snapshotBits))
      .filter(not(BloomSketch.mightContain("__snapshot_bits", keyCol, numBits, numProbes)))
      .drop("__snapshot_bits")
    withinWatermark(gated, eventTimeCol, delayThreshold, Seq(keyCol))
  }

  /** Fold a day's KEPT digests into the snapshot's Bloom bits WITHOUT
    * rescanning the old corpus — the q171 roll contract on the
    * exact-dedup state (its near-dup sibling is
    * NearDupStream.rollSnapshot; the digest-set form is q173). Per-key
    * bit-setting is independent (each key ORs its own probe bits), so
    * bits(old ∪ kept) == bits(old) | bits(kept) EXACTLY at the same
    * (m, probes): the Bloom roll is LOSSLESS versus a full recompute —
    * StreamDedupSpec asserts bitwise equality, not just verdict parity.
    * `keptDigests` is the day's kept keys — the stream's own output. */
  def rollSnapshotBits(oldBits: Seq[Long], keptDigests: Seq[Long],
                       numProbes: Int): Seq[Long] = {
    val sketch = new BloomSketch(oldBits.size * 64, numProbes)
    val folded = keptDigests.foldLeft(sketch.zero)(sketch.reduce)
    oldBits.zip(folded).map { case (a, b) => a | b }
  }
}
