package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped by domain (the maps below are the source of truth):
  *  - ForwardingOps: q01-q15 forwarding data-plane + control-plane ops,
  *    q18 salted hot-key agg, q64 sketched hot keys, q70 throughput trend,
  *    q79 Z-order layout, q80 partition-load Gini, q83 incremental
  *    agg-state merge, q85 histogram quantiles, q89 gap detection,
  *    q90 drift chi-square, q93 log compaction, q95 burst detection,
  *    q100 erasure audit
  *  - SessionOps: q16-q17 sessions/enrichment, q19 as-of join,
  *    q36 top-tokens, q38 curation pipeline, q46 IVF ANN, q52 range join,
  *    q61 event-time interval join (batch form of streaming/StreamJoin),
  *    q84 funnel analysis, q91 cohort retention, q92 transition matrix,
  *    q141 session-document assembly (logs → ordered LM corpus docs)
  *  - RelationalOps: q20-q24 relational analytics, q25 rollup subtotals,
  *    q26 blocked fuzzy self-join, q27 JSON extraction, q28 pivot,
  *    q29 grouping sets, q73 decorrelated EXISTS, q78 MERGE upsert,
  *    q86 fixed-point PageRank, q87 quality-constraint audit,
  *    q88 referential integrity, q94 Benford audit, q96 skyline,
  *    q98 MAD outliers
  *  - TextOps: q30-q35 text analysis + dedup, q37 TF-IDF, q39 BPE-ish
  *    tokens, q51 PII scan, q53 hash-split, q54 decontamination,
  *    q55 chunking, q56 repetition gate, q60 cross-doc span dedup,
  *    q62 mixture sampling, q63 sequence packing, q65 count-LM quality,
  *    q66 bloom-prefiltered decontamination, q67 per-group uniform sample,
  *    q74 inverted index, q75 PMI collocations, q76 BM25 retrieval,
  *    q77 weighted sampling, q99 boilerplate detection,
  *    q108 token-budget corpus selection, q110 incremental dedup,
  *    q114 sliding n-gram duplication profile, q115 temperature-scaled
  *    mixture weights, q116 BPE merge candidates, q117 cross-source
  *    span-overlap matrix, q118 iterated BPE training, q119 trained-
  *    tokenizer application (fertility/compression per source),
  *    q121 corpus snapshot diff (membership churn + content resurrection),
  *    q136 soft dedup (duplicate down-weighting), q137 containment pairs
  *    (asymmetric excerpt detection), q138 n-gram novelty decay (arrival-
  *    batch diminishing returns), q139 filter-threshold calibration,
  *    q142 cross-source copy attribution (directed who-copies-whom),
  *    q143 dedup yield curve (multiplicity histogram + savings),
  *    q145 range-partition boundary planning + balance audit,
  *    q151 DSIR resample execution (q124's importance weights drawn
  *    through the q62 deterministic hash gate — audit turned selection),
  *    q173 two-day exact-dedup roll (q171's daily-loop contract on
  *    q110's digest state: roll = union with the kept sliver, oracle
  *    recomputes from scratch — roll ≡ recompute by hash),
  *    q155 dedup-policy selection (q143's yield curve consumed: the
  *    largest multiplicity threshold retaining ≥900‰ of max savings),
  *    q157 substring-removal execution (q128's ExactSubstr audit
  *    applied: interval unions deleted, docs rebuilt from kept tokens,
  *    bit_xor cleaned-corpus fingerprint — reconciles with q128),
  *    q159 quality-filter execution (q139's calibrated per-source
  *    thresholds applied: sub-threshold docs dropped, realized keep
  *    rate reconciles exactly with q139's acceptance_permille),
  *    q160 packing-budget sweep (q63's packing at context length
  *    512..8192 in one pass — fill vs truncation curve per budget;
  *    2048 row reconciles exactly with q63's global rollup),
  *    q162 deterministic shuffle + shard manifest (hash-ordered
  *    reproducible global shuffle: per-shard docs/token share,
  *    first-doc ordering witness, bit_xor membership fingerprint),
  *    q163 decontamination execution (q54's verdicts applied: flagged
  *    docs dropped, corpus rebuilt, per-lang drops reconcile with the
  *    audit — the sixth audit→execution bridge),
  *    q165 epoch-mixture execution (q131's capped plan applied with
  *    deterministic fractional epochs — the seventh bridge, the first
  *    that UP-samples; bit_xor multiset fingerprint pins replica
  *    counts), q166 training-set materialization manifest (q165 × q162:
  *    the replica multiset globally shuffled and sharded under fresh
  *    per-replica order keys; reconciles with q165's totals; realized
  *    as written sorted shards in ShardWriteSpec)
  *  - SimilarityOps: q40-q43 similarity + sketches, q47 embedding
  *    near-dup, q48 dup clustering, q57 fixed-point k-means, q58 trained-IVF
  *    ANN, q59 product-quantization ANN, q68 SemDeDup (cluster-partitioned
  *    semantic dedup), q69 cluster outliers, q72 ANN recall@k,
  *    q97 MRR@k index evaluation, q106 hard-negative mining,
  *    q107 coverage-aware diversity sampling, q109 quality-aware
  *    canonical selection over verified near-dup pairs,
  *    q112 cross-modal alignment filter (CLIP-score-gate shape),
  *    q113 incremental IVF index maintenance, q120 cross-modal
  *    retrieval evaluation (true-pair rank / hit@k / MRR),
  *    q140 label-purity audit (fixed-point label-noise detection),
  *    q144 split repair (the move plan fixing q134's audited leakage),
  *    q146 PQ quantization-distortion audit (per-label reconstruction
  *    error of q59's trained codebooks), q147 PQ end-to-end recall@k
  *    (exact top-k vs the ADC scan over the codes), q148 IVF probe sweep
  *    (recall + scan cost per nprobe ∈ {1,2,4} — the tuning curve the
  *    q58-family serving path consumes via its nprobe parameter),
  *    q149 probe-plan selection (per query, the smallest nprobe whose
  *    recall meets the 800‰ target from q148's curve — the sweep
  *    turned into the serving configuration), q150 IVF-PQ serving
  *    evaluation (coarse cells prune, PQ codes rank via ADC — recall +
  *    scan cost of the combined index vs the exact top-k), q152
  *    residual-encoded IVF-PQ (the full FAISS IVFADC: PQ trained on
  *    v − centroid residuals, per-(query, cell) distance tables),
  *    q153 refined IVF-PQ (IndexRefineFlat: exact re-rank of the
  *    top-3k ADC shortlist — recall provably ≥ q150's per query),
  *    q154 LSH banding sweep (the dedup analog of q148: candidate
  *    volume / verified pairs / recall / precision per rows-per-band
  *    r ∈ {4,8,16} over ONE signature pass — the curve justifying
  *    q41's r=8 serving config), q156 refined residual IVF-PQ (the
  *    production FAISS default — q153's refine over q152's residual
  *    ADC chain, completing the {raw,residual}×{ADC,refined} matrix),
  *    q158 near-dup removal execution (q109's selection applied
  *    corpus-wide: verified pairs → connected components → one
  *    best-TTR canonical kept per cluster, bit_xor kept-corpus
  *    fingerprint — docs_dropped ≡ active nodes − components),
  *    q161 incremental near-dup dedup (q110's daily-increment
  *    contract on LSH: arrivals probe the snapshot's banded signature
  *    buckets + within-batch candidates, one Jaccard verify — q110's
  *    schema and precedence, near beside exact),
  *    q171 snapshot roll (the daily loop closed: kept arrivals fold
  *    into the rollable band-bucket state without rescanning the old
  *    corpus; two consecutive days, day 2 probing the rolled state,
  *    oracle recomputes from scratch — roll ≡ recompute by hash),
  *    q172 daily-increment composition (one arrival batch through
  *    exact dedup → near-dup → IVF maintenance → novelty as one
  *    per-source funnel; reconciles with q110/q161 standalones),
  *    q174 IVF cell-split execution (q113's audit acted on: local K=2
  *    Lloyd inside flagged cells, every other centroid frozen),
  *    q175 PQ ADC serving from the stored model artifact (training
  *    removed from the query; oracle retrains inline so the hash
  *    compare proves artifact ≡ training), q176 roll-then-compact
  *    (curation shrinks the rolled band state, tombstone rule pinned),
  *    q177 tombstone-retiring state rebuild (the long-cadence
  *    maintenance pass: band state recomputed from the live corpus,
  *    compacted-vs-rebuilt comparison + retired-tombstone accounting)
  *  - MultimodalOps: q44-q45 multimodal plumbing, q49 frame sampling,
  *    q81 perceptual-hash near-dup, q82 audio energy windows,
  *    q111 scene-cut detection
  *  - PipelineOps: q50 full-engine pipeline
  *  - CurationExec: q164 composed curation pipeline (the five
  *    corpus-rewriting bridges — q158 near-dup removal → q157 substring
  *    removal → q159 quality filter → q151 DSIR resample → q163 decon —
  *    as ONE dataflow, per-source funnel + final corpus fingerprint),
  *    q167 curated training-set materialization (q164 × q165 × q166:
  *    the shipped corpus epoch-planned on its own masses, replicated
  *    through fresh gate/key domains, sharded into q166's manifest
  *    schema — the full arc, audits to training shards, one dataflow)
  * Every query has an exact DuckDB oracle (see oracleSql).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full routing pipeline (status -> code -> escalation -> destination). */
  def entry(spark: SparkSession): DataFrame =
    ForwardingOps.q02RouteDestinations(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ForwardingOps.queries ++ RelationalOps.queries ++ TextOps.queries ++
      SimilarityOps.queries ++ MultimodalOps.queries ++ PipelineOps.queries ++
      CurationExec.queries ++ SessionOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — including q41, whose multiply-shift hash
    * family was chosen so int128 SQL arithmetic can replay the u64
    * signature exactly (see SimilarityOps.q41Sql). */
  def oracleSql: Map[String, String] =
    ForwardingOps.oracles ++ RelationalOps.oracles ++ TextOps.oracles ++
      SimilarityOps.oracles ++ MultimodalOps.oracles ++ PipelineOps.oracles ++
      CurationExec.oracles ++ SessionOps.oracles
}
