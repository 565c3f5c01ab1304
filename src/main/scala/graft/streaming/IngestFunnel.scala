package graft.streaming

import graft.functions.BloomSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The composed streaming DAILY-INGEST funnel — batch q172's live twin,
 * wiring the four live twins into one arrival-to-index pipeline, cheapest
 * stage first (q172's discipline: exact digests kill identical copies
 * before anything signature-shaped runs):
 *
 *   A. exact dedup vs the snapshot digest set — [[exactStage]]:
 *      StreamDedup.againstSnapshot over the 60-bit normalized-text digest
 *      (q110's normalization via TextOps.norm), split label-preservingly
 *      into (snapshot dups, survivors) so the funnel ACCOUNTS for its
 *      drops instead of silently filtering;
 *   B. near-dup of the survivors vs the snapshot band state + each
 *      other — NearDupStream.bandVerdicts + resolve (unchanged, the
 *      stage owns its keyed state);
 *   C. IVF load on FROZEN snapshot centroids — IndexStream
 *      .windowedCellLoad fed the stored-model artifact's centroid table
 *      and base distribution (SimilarityOps.storedIvfModel: a serving
 *      tier loads its index, it never retrains on read);
 *   D. 3-gram novelty vs the snapshot's type set — [[noveltyStage]]:
 *      NoveltyStream's gram digests, deduped within the watermark and
 *      probed against the snapshot gram Bloom bits.
 *
 * Stage handoffs are STREAM OUTPUTS — topics through the graft-queue
 * sink — because stages A and B each own a stateful operator with its own
 * watermark/state lifecycle: the same decomposition the reference runs as
 * separate consumer jobs chained by retry/result topics (uforwarder's
 * RetryTopic pipeline shape). IngestFunnelSpec exercises BOTH wirings:
 * MemoryStream re-feeds (stage isolation) and the full topic chain
 * (arrivals topic → A → survivors topic → B → kept topic → C/D) with a
 * checkpoint restart mid-funnel, each reconciled row-for-row with batch
 * q172.
 *
 * EVERY piece of cross-day state rolls forward in O(day), never by
 * rescanning the old corpus: stage A's Bloom bits
 * (StreamDedup.rollSnapshotBits — lossless OR), stage B's band state
 * (NearDupStream.rollSnapshot — mergeable smallest-k), stage C's frozen
 * model (the fingerprint-keyed artifact, retrained only when the snapshot
 * itself rebuilds), stage D's gram bits ([[snapshotGramBits]] output rolls
 * with the same OR as stage A's). IngestFunnelSpec reconciles every
 * stage's counts row-for-row against batch q172 on the same arrival batch.
 */
object IngestFunnel {

  /** The 60-bit content digest of the NORMALIZED text — q110/q172's
    * normalization (TextOps.norm), md5, first 15 hex digits. 60 bits is
    * the q66/q67 digest discipline: collision-free in practice at any
    * one day's scale, and exactly reconciled against the batch md5-128
    * dedup by the spec. */
  private[graft] def normDigest =
    graft.plans.TextKernels.md5_prefix60(graft.operators.TextOps.norm.cast("binary"))

  /** The snapshot's exact-dedup Bloom bits over DISTINCT normalized-text
    * digests — stage A's rollable state, built once per snapshot (one
    * aggregation; at 100 TB the bits roll daily via
    * StreamDedup.rollSnapshotBits instead of re-aggregating). */
  def snapshotDigestBits(snapshotDocs: DataFrame, numBits: Int, numProbes: Int): Seq[Long] =
    snapshotDocs.select(normDigest.as("digest"))
      .agg(BloomSketch.bloom_agg(col("digest"), numBits, numProbes))
      .head().getSeq[Long](0).toSeq

  /** The snapshot's 3-gram type-set Bloom bits — stage D's rollable
    * state (q138's gram definition via NoveltyStream.gramHashes). */
  def snapshotGramBits(snapshotDocs: DataFrame, numBits: Int, numProbes: Int): Seq[Long] =
    NoveltyStream.gramHashes(snapshotDocs)
      .agg(BloomSketch.bloom_agg(col("h"), numBits, numProbes))
      .head().getSeq[Long](0).toSeq

  /** Stage A, label-preserving: returns (snapshot-dup arrivals, surviving
    * arrivals). The dup leg is the STATELESS Bloom-hit filter (its rows
    * are q172's `exact_dup_old`); the survivor leg is StreamDedup
    * .againstSnapshot — the same Bloom gate plus the within-watermark
    * dedup, so (arrivals − dups − survivors) is exactly q172's
    * `exact_dup_within`. Both legs are derived from the SAME input frame;
    * running them as two sinks of one source costs one extra stateless
    * scan, not a second stateful pipeline. */
  def exactStage(arrivals: DataFrame, eventTimeCol: String, delayThreshold: String,
                 snapshotBits: Seq[Long], numProbes: Int): (DataFrame, DataFrame) = {
    val numBits = snapshotBits.size * 64
    val withDigest = arrivals.withColumn("digest", normDigest)
      .withColumn("__snapshot_bits", typedlit(snapshotBits))
    val dupsVsOld = withDigest
      .filter(BloomSketch.mightContain("__snapshot_bits", "digest", numBits, numProbes))
      .drop("__snapshot_bits")
    val survivors = StreamDedup.againstSnapshot(
      arrivals.withColumn("digest", normDigest),
      eventTimeCol, delayThreshold, "digest", snapshotBits, numProbes)
    (dupsVsOld, survivors)
  }

  /** Stage D: one row per DISTINCT (source, gram-digest) of the ingested
    * stream, flagged `novel` when the digest misses the snapshot's gram
    * bits — q172 stage D's (types_present, types_novel) accounting as a
    * stream (the spec aggregates the rows; a production funnel feeds them
    * to NoveltyStream.monitor for the windowed trend). Distinctness uses
    * the same within-watermark dedup as stage A — gram state is bounded
    * by the watermark horizon, not the corpus. */
  def noveltyStage(ingested: DataFrame, eventTimeCol: String, delayThreshold: String,
                   gramBits: Seq[Long], numProbes: Int): DataFrame = {
    val numBits = gramBits.size * 64
    val grams = NoveltyStream.gramHashes(ingested, carry = Seq(eventTimeCol))
    StreamDedup.withinWatermark(grams, eventTimeCol, delayThreshold, Seq("source", "h"))
      .withColumn("__gram_bits", typedlit(gramBits))
      .withColumn("novel",
        not(BloomSketch.mightContain("__gram_bits", "h", numBits, numProbes)))
      .drop("__gram_bits")
  }
}
