package graft.streaming

import graft.operators.SimilarityOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming incremental NEAR-dup dedup — the live twin of the q161 batch
 * operator (operators/SimilarityOps.scala), completing the twin set next to
 * StreamDedup (which covers q110's exact digests): arriving documents are
 * checked against yesterday's near-deduped SNAPSHOT and against each other,
 * never all-pairs against the corpus.
 *
 * Dataflow, stage by stage (q161's shape re-cut for micro-batches):
 *  1. STATELESS enrich: per arrival one native MinHash signature
 *     (plans/MinHashSig — the same one-pass expression the snapshot used),
 *     the q41 shingle set, and the banding projection — all codegen'd
 *     column work before any state.
 *  2. ONE stateful op, keyed by (band, band_sig) — the probe key IS the
 *     group key, so the snapshot probe and within-stream candidate
 *     generation share a single state layout:
 *      - snapshot probe: the key looks up the snapshot's capped band table
 *        (a driver-built broadcast map here; at snapshots past broadcast
 *        size the same keyed lookup runs as a state-store-initialized map
 *        or a stream-static equi-join — the q161 probe contract either way;
 *        size-1 snapshot buckets kept, they are the dup targets);
 *      - within-stream: group state holds the bucket's prior arrivals
 *        (id + shingle set), capped at MaxBucketSize (q41's no-signal
 *        rule), verified against the new arrival with TRUE Jaccard right
 *        in the operator — both shingle sets are already in hand;
 *      - state is evicted by EVENT-TIME TIMEOUT once the watermark passes
 *        a bucket's horizon, so state is bounded by (bucket arrival rate ×
 *        watermark horizon) × MaxBucketSize, regardless of stream length.
 *  3. Jaccard verify of the snapshot candidates IN THE MICRO-BATCH
 *     ([[resolve]], called from foreachBatch): the arrival's shingles ride
 *     the operator output; the old side equi-joins the snapshot shingle
 *     frame on the candidate-id sliver (broadcast of the sliver, never the
 *     snapshot), then per-doc flags fold with q161's precedence —
 *     dup_vs_old beats dup_within beats kept.
 *
 * Parity with batch q161 (asserted by NearDupStreamSpec on replayed
 * arrivals, checkpoint restart included): identical signatures, banding,
 * shingles, Jaccard gate (2·inter ≥ union) and precedence. Two replay
 * preconditions make stream ≡ batch exact: arrivals replay in doc_id order
 * (batch's min-id-wins is arrival-order-free; the stream sees earlier =
 * smaller), and no arrival bucket exceeds MaxBucketSize (batch drops
 * over-cap buckets retroactively; a stream can only cap the prefix) — the
 * spec asserts both on its corpus, the q161-subsumes-q110 pattern.
 */
object NearDupStream {

  /** One arrival × band row after the stateless enrich. */
  final case class BandRow(
      doc_id: Long, ts: java.sql.Timestamp, band: Int, band_sig: String,
      shingles: Seq[String])

  /** A prior arrival held in bucket state: id + its verified shingle set. */
  final case class BucketMember(docId: Long, shingles: Seq[String])
  final case class BucketState(members: List[BucketMember])

  /** Per (arrival, band) verdict leaving the stateful op: the within-stream
    * flag is already VERIFIED (both shingle sets were in hand); snapshot
    * candidates leave unverified for the micro-batch join ([[resolve]]).
    * Shingles ride along for that verify (4 bands/doc; a production trim
    * emits them only when old_cands is non-empty). */
  final case class BandVerdict(
      doc_id: Long, ts: java.sql.Timestamp, has_prior: Boolean,
      old_cands: Seq[Long], shingles: Seq[String])

  /** The snapshot's capped band table as a driver map — (band, band_sig) →
    * bucket member ids, size-1 buckets KEPT, over-cap buckets dropped:
    * exactly q161's oldBuckets probe table. */
  def snapshotBandTable(snapshotDocs: DataFrame): Map[(Int, String), Seq[Long]] = {
    import graft.plans.MinHashSig.minhash_sig
    val sig = snapshotDocs.select(col("doc_id"),
      minhash_sig(col("text"), 5, SimilarityOps.NumHashes).as("sig"))
    SimilarityOps.bandedSigs(sig, SimilarityOps.BandSize)
      .groupBy("band", "band_sig")
      .agg(graft.functions.SmallestK.smallest_k(col("doc_id"),
        SimilarityOps.MaxBucketSize + 1).as("ids"))
      .filter(size(col("ids")) <= SimilarityOps.MaxBucketSize)
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        r.getAs[scala.collection.Seq[Long]](2).toSeq)
      .toMap
  }

  /** The snapshot shingle frame (doc_id, sh) for the micro-batch verify —
    * the q41 shingle definition, computed once and typically cached. */
  def snapshotShingles(snapshotDocs: DataFrame): DataFrame =
    snapshotDocs.select(col("doc_id"), SimilarityOps.charShingles.as("sh"))

  /** Stages 1+2: enrich arrivals (`doc_id`, `text`, event time), band them,
    * and run the keyed stateful op against `snapshot`. `delayMs` is both
    * the watermark delay and the bucket-state eviction horizon. */
  def bandVerdicts(df: DataFrame, snapshot: Map[(Int, String), Seq[Long]],
                   eventTimeCol: String, delayMs: Long): Dataset[BandVerdict] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = if (df.isStreaming) df.withWatermark(eventTimeCol, s"$delayMs milliseconds") else df
    base
      .withColumn("sig", graft.plans.MinHashSig.minhash_sig(
        col("text"), 5, SimilarityOps.NumHashes))
      .withColumn("shingles", SimilarityOps.charShingles)
      .select(col("doc_id"), col(eventTimeCol).as("ts"), col("shingles"),
        posexplode(SimilarityOps.bandArrayExpr(SimilarityOps.BandSize)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_sig")
      .as[BandRow]
      .groupByKey(r => (r.band, r.band_sig))
      .flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process(snapshot, delayMs))
  }

  private def process(snapshot: Map[(Int, String), Seq[Long]], delayMs: Long)(
      key: (Int, String), rows: Iterator[BandRow],
      state: GroupState[BucketState]): Iterator[BandVerdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // min-id-wins within the batch regardless of iterator order; across
    // batches the replay-in-id-order precondition makes earlier = smaller
    val sorted = rows.toIndexedSeq.sortBy(_.doc_id)
    var members = state.getOption.map(_.members).getOrElse(Nil)
    val oldIds = snapshot.getOrElse(key, Seq.empty)
    val out = sorted.map { r =>
      val sh = r.shingles.toSet
      // TRUE Jaccard vs prior bucket mates — q161's integer gate
      val hasPrior = members.exists { m =>
        val inter = m.shingles.count(sh.contains)
        inter * 2 >= m.shingles.size + sh.size - inter
      }
      if (members.size < SimilarityOps.MaxBucketSize)
        members = BucketMember(r.doc_id, r.shingles) :: members
      BandVerdict(r.doc_id, r.ts, hasPrior, oldIds, r.shingles)
    }
    state.update(BucketState(members))
    state.setTimeoutTimestamp(sorted.map(_.ts.getTime).max + delayMs)
    out.iterator
  }

  /** Stage 3, inside foreachBatch: verify the micro-batch's snapshot
    * candidates with true Jaccard against the snapshot shingle frame and
    * fold per-doc flags with q161's precedence. Returns one row per
    * arrival: (doc_id, ts, status ∈ kept | dup_vs_old | dup_within). */
  def resolve(batch: DataFrame, snapshotSh: DataFrame): DataFrame = {
    val perDoc = batch.groupBy("doc_id", "ts").agg(
      (max(when(col("has_prior"), 1L).otherwise(0L)) === 1L).as("has_prior"),
      array_distinct(flatten(collect_list(col("old_cands")))).as("old_cands"),
      first(col("shingles")).as("sh")) // identical across a doc's band rows
    // candidate sliver → broadcast into the snapshot shingle frame: the
    // join ships the (few) candidates to the (large) snapshot side, never
    // the reverse, and only candidate old docs get their shingles read
    val pairs = perDoc.filter(size(col("old_cands")) > 0)
      .select(col("doc_id"), col("sh"), explode(col("old_cands")).as("old_id"))
    val verified = snapshotSh
      .withColumnRenamed("doc_id", "old_id").withColumnRenamed("sh", "old_sh")
      .join(broadcast(pairs), Seq("old_id"))
      .withColumn("inter", size(array_intersect(col("sh"), col("old_sh"))).cast("long"))
      .filter(col("inter") * lit(2L) >=
        size(col("sh")).cast("long") + size(col("old_sh")).cast("long") - col("inter"))
      .select("doc_id").distinct()
      .withColumn("has_old", lit(true))
    perDoc.join(verified, Seq("doc_id"), "left_outer")
      .withColumn("status",
        when(coalesce(col("has_old"), lit(false)), lit("dup_vs_old"))
          .when(col("has_prior"), lit("dup_within"))
          .otherwise(lit("kept")))
      .select(col("doc_id"), col("ts"), col("status"))
  }
}
