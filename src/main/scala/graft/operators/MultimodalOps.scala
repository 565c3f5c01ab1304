package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media payloads ride as opaque `binary` columns
 * with a typed metadata struct; decode / feature-extraction runs
 * partition-parallel with real Spark plumbing (schema, batching,
 * partitioning) and a deterministic stand-in decoder — the actual
 * image/audio codec is environment-provided in production (the container has
 * no media libraries), so `fakeDecode` below is the clearly-marked stub.
 *
 * The `events.props` strings act as the binary payloads in the test data.
 */
object MultimodalOps {

  /** events reader shared by every query here (the payload source);
    * `ts` arrives normalized to epoch-nanos Long (see [[graft.Tables]]). */
  private def events(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)

  /** STUB: deterministic stand-in for a real media decoder. In production
    * this is the boundary where libjpeg/ffmpeg-style codecs plug in; the
    * Spark-side contract (bytes in, fixed-width feature struct out) is what
    * matters and is exercised for real. */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
    val width = 16 + (if (payload.isEmpty) 0 else (payload.head & 0x0f))
    val height = 16 + (payload.length % 16)
    val checksum = payload.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
    (width, height, checksum)
  }

  // ===========================================================
  // q44 — multimodal metadata pipeline: payload bytes -> size buckets +
  // per-bucket stats. Pure column ops (codegen'd); the decode stub runs in
  // q45's mapPartitions path.
  // ===========================================================
  def q44MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .select(
        col("event_id").as("media_id"),
        col("props").cast("binary").as("payload"),
        col("event_type").as("media_kind"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("size_bucket", floor(col("n_bytes") / 4.0).cast("long"))
      .withColumn("digest", md5(col("payload")))
      .groupBy("media_kind", "size_bucket")
      .agg(
        count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        countDistinct("digest").as("uniq_payloads"))
      .orderBy("media_kind", "size_bucket")
  }

  val q44Sql: String =
    """WITH m AS (SELECT event_id AS media_id, encode(props) AS payload,
      |  event_type AS media_kind,
      |  CAST(octet_length(encode(props)) AS BIGINT) AS n_bytes,
      |  md5(props) AS digest
      | FROM events)
      |SELECT media_kind, CAST(floor(n_bytes / 4.0) AS BIGINT) AS size_bucket, COUNT(*) AS n,
      | CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      | COUNT(DISTINCT digest) AS uniq_payloads
      |FROM m GROUP BY media_kind, size_bucket ORDER BY media_kind, size_bucket""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q45 — decode + feature extraction via mapPartitions (the stubbed-decoder
  // path with real partition-parallel plumbing; the deterministic stub is
  // replayed exactly by the SQL oracle below)
  // ===========================================================
  def q45DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    // the schema allows null ids/payloads; the decode loop dereferences both
    val src = events(spark, dir)
      .filter(col("event_id").isNotNull && col("props").isNotNull)
      .select(col("event_id").as("media_id"), col("props").cast("binary").as("payload"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    val decoded = src.mapPartitions { rows =>
      // batch-shaped loop: one decoder instance per partition, like a real
      // codec handle; rows stream through without materializing the partition
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, c) = fakeDecode(payload)
        Row(id, w, h, c)
      }
    }(encoder)
    decoded.groupBy((col("checksum") % 7).as("checksum_mod"))
      .agg(count(lit(1)).as("n"), sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"))
      .orderBy("checksum_mod")
  }

  /** Oracle: replays `fakeDecode` in SQL. The Long-wraparound checksum fold
    * is emulated with HUGEINT intermediates mod 2^64 (payloads are ASCII, so
    * ord(char) == byte value; Verify would catch a non-ASCII regression as a
    * hash mismatch). */
  val q45Sql: String =
    """WITH src AS (SELECT event_id AS media_id, props FROM events
      |  WHERE event_id IS NOT NULL AND props IS NOT NULL),
      | dec AS (SELECT media_id,
      |   16 + CASE WHEN length(props) = 0 THEN 0 ELSE ord(substr(props, 1, 1)) & 15 END AS width,
      |   16 + length(props) % 16 AS height,
      |   CASE WHEN length(props) = 0 THEN CAST(0 AS HUGEINT) ELSE
      |     list_reduce(list_transform(range(1, length(props) + 1),
      |         i -> CAST(ord(substr(props, CAST(i AS INTEGER), 1)) AS HUGEINT)),
      |       (a, b) -> (a * 31 + b) % 18446744073709551616) END AS craw
      |  FROM src),
      | s AS (SELECT media_id, width, height,
      |   CAST(CASE WHEN craw > 9223372036854775807 THEN craw - 18446744073709551616
      |        ELSE craw END AS BIGINT) AS checksum FROM dec)
      |SELECT CAST(checksum % 7 AS BIGINT) AS checksum_mod, COUNT(*) AS n,
      | CAST(SUM(width) AS BIGINT) AS sum_width, CAST(SUM(height) AS BIGINT) AS sum_height
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q49 — video-style frame sampling: treat the payload as a sequence of
  // fixed-width frames (8 bytes each), sample every 3rd frame (stride
  // sampling, the standard pretraining downsample), fingerprint each
  // sampled frame, and report per-media-kind frame volume + uniqueness.
  //
  // Scale path: frames explode partition-parallel off the payload column
  // (lateral view), so a media file never has to fit a row budget — the
  // row count multiplies but stays distributed; the only shuffle is the
  // final groupBy. The frame "decode" here is substring+md5 (the container
  // has no codecs); a real decoder slots into the same explode shape.
  // ===========================================================
  def q49FrameSample(spark: SparkSession, dir: String): DataFrame = {
    val frames = events(spark, dir)
      .select(col("event_id").as("media_id"), col("event_type").as("media_kind"),
        col("props").as("payload"))
      .filter(length(col("payload")) >= 8)
      .withColumn("frame", explode(expr(
        // frame i starts at byte i*8; keep i % 3 == 0 (stride 3)
        """filter(transform(sequence(0, int(floor((length(payload) - 8) / 8))),
          |  i -> struct(i AS idx, substring(payload, i * 8 + 1, 8) AS bytes)),
          |  f -> f.idx % 3 = 0)""".stripMargin)))
      .select(col("media_id"), col("media_kind"),
        col("frame.idx").as("frame_idx"), md5(col("frame.bytes").cast("binary")).as("frame_digest"))
    frames.groupBy("media_kind")
      .agg(
        countDistinct("media_id").as("n_media"),
        count(lit(1)).as("n_frames_sampled"),
        countDistinct("frame_digest").as("n_uniq_frames"),
        max("frame_idx").cast("long").as("max_frame_idx"))
      .orderBy("media_kind")
  }

  val q49Sql: String =
    """WITH m AS (SELECT event_id AS media_id, event_type AS media_kind, props AS payload
      |  FROM events WHERE length(props) >= 8),
      | f AS (SELECT media_id, media_kind, u.idx AS frame_idx,
      |   md5(substring(payload, u.idx * 8 + 1, 8)) AS frame_digest
      |  FROM m, LATERAL (SELECT unnest(generate_series(0,
      |    CAST(floor((length(payload) - 8) / 8) AS INTEGER))) AS idx) u
      |  WHERE u.idx % 3 = 0)
      |SELECT media_kind, COUNT(DISTINCT media_id) AS n_media,
      | COUNT(*) AS n_frames_sampled,
      | COUNT(DISTINCT frame_digest) AS n_uniq_frames,
      | CAST(MAX(frame_idx) AS BIGINT) AS max_frame_idx
      |FROM f GROUP BY media_kind ORDER BY media_kind""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q81 — perceptual-hash near-dup over media payloads: the aHash pipeline
  // (sample a fixed pixel grid, threshold each sample against the mean,
  // pack the sign bits) with Hamming-ball probing. The decode is the
  // deterministic stand-in (payload chars as pixels — a real build swaps
  // in the image codec at the SAME column boundary); everything after the
  // hash is the real scale machinery: group to DISTINCT hashes first
  // (collapsing exact dups before any join), then probe Hamming distance 1
  // by generating the 16 single-bit flips of each hash and equi-joining
  // them back against the hash table — a bounded 16× fan-out of the
  // DISTINCT-hash table, never a pairwise or band-bucket blowup. The
  // threshold test is exact integer (p·16 > sum), no float mean.
  // ===========================================================
  val AHashBits = 16

  def q81AhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    // the hash is FLAT integer arithmetic — no arrays, no higher-order
    // functions (interpreted lambdas cost ~3x here): one padded string,
    // 16 pixel reads (common-subexpression-eliminated inside codegen), an
    // exact integer mean test p·16 > Σp per bit
    def pixel(i: Int) = s"CAST(ascii(substring(pad, $i, 1)) AS BIGINT)"
    val sumExpr = (1 to AHashBits).map(pixel).mkString(" + ")
    val hashExpr = (1 to AHashBits).map(i =>
      s"IF(${pixel(i)} * $AHashBits > s, ${1L << (i - 1)}L, 0L)").mkString(" + ")
    val h = events(spark, dir)
      .filter(col("props").isNotNull)
      .withColumn("pad", rpad(col("props"), AHashBits, "x")) // pad ONCE, not per pixel
      .withColumn("s", expr(sumExpr))
      .withColumn("ahash", expr(hashExpr))
    val grp = h.groupBy("ahash").agg(count(lit(1)).as("n"))
    val flips = grp.select(col("ahash"), col("n"),
      explode(expr(s"transform(sequence(0, ${AHashBits - 1}), " +
        "i -> ahash ^ shiftleft(1L, i))")).as("nb"))
    val neighbors = flips
      .join(grp.select(col("ahash").as("nb"), col("n").as("nn")), "nb")
      .groupBy("ahash").agg(sum("nn").cast("long").as("n_hamming1"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("ahash"))
    grp.join(neighbors, Seq("ahash"), "left_outer")
      .withColumn("n_hamming1", coalesce(col("n_hamming1"), lit(0L)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 20)
      .select("rank", "ahash", "n", "n_hamming1")
      .orderBy("rank")
  }

  val q81Sql: String = {
    def pixel(i: Int) = s"CAST(ord(substr(pad, $i, 1)) AS BIGINT)"
    val sumExpr = (1 to AHashBits).map(pixel).mkString(" + ")
    val hashExpr = (1 to AHashBits).map(i =>
      s"CASE WHEN ${pixel(i)} * $AHashBits > s THEN ${1L << (i - 1)} ELSE 0 END").mkString(" + ")
    s"""WITH pads AS (SELECT rpad(props, $AHashBits, 'x') AS pad FROM events
       |  WHERE props IS NOT NULL),
       | sums AS (SELECT pad, $sumExpr AS s FROM pads),
       | hsh AS (SELECT $hashExpr AS ahash FROM sums),
       | grp AS (SELECT ahash, COUNT(*) AS n FROM hsh GROUP BY ahash),
       | fl AS (SELECT ahash, n, unnest(list_transform(range(0, $AHashBits),
       |   i -> xor(ahash, 1::BIGINT << CAST(i AS INTEGER)))) AS nb FROM grp),
       | nbr AS (SELECT fl.ahash, CAST(SUM(g2.n) AS BIGINT) AS n_hamming1
       |  FROM fl JOIN grp g2 ON fl.nb = g2.ahash GROUP BY fl.ahash),
       | r AS (SELECT grp.ahash, grp.n, COALESCE(nbr.n_hamming1, 0) AS n_hamming1,
       |   ROW_NUMBER() OVER (ORDER BY grp.n DESC, grp.ahash) AS rank
       |  FROM grp LEFT JOIN nbr ON grp.ahash = nbr.ahash)
       |SELECT rank, ahash, n, n_hamming1 FROM r WHERE rank <= 20
       |ORDER BY rank""".stripMargin.replace("\n", " ")
  }

  // ===========================================================
  // q82 — windowed audio energy: the silence-detection / energy-profile
  // pass of an audio curation pipeline. The decode stub treats payload
  // chars as centered PCM samples (code − 96); real builds swap the codec
  // at the same boundary. Per media: 4-sample windows, integer
  // sum-of-squares energy each, silence = energy below threshold. All
  // integer arithmetic over array HOFs — the windowing/aggregation
  // plumbing (schema, batching, per-kind rollup) is the real deliverable,
  // exactly like q45/q49.
  // ===========================================================
  val EnergyWin = 4
  val SilenceThr = 500L

  def q82AudioEnergy(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("props").isNotNull && length(col("props")) >= EnergyWin)
      .select(col("event_type").as("media_kind"),
        expr("transform(sequence(1, length(props)), i -> " +
          "CAST(ascii(substring(props, i, 1)) - 96 AS BIGINT))").as("pcm"))
      .withColumn("wins", expr(
        s"transform(sequence(0, (size(pcm) DIV $EnergyWin) - 1), " +
          s"w -> aggregate(slice(pcm, w * $EnergyWin + 1, $EnergyWin), 0L, (a, x) -> a + x * x))"))
      .groupBy("media_kind")
      .agg(count(lit(1)).as("n_media"),
        sum(size(col("wins"))).cast("long").as("n_windows"),
        sum(expr(s"size(filter(wins, e -> e < $SilenceThr))")).cast("long").as("n_silent"),
        max(expr("array_max(wins)")).as("max_energy"))
      .orderBy("media_kind")

  val q82Sql: String =
    s"""WITH m AS (SELECT event_type AS media_kind,
       |  list_transform(range(1, length(props) + 1),
       |    i -> CAST(ord(substr(props, CAST(i AS INTEGER), 1)) - 96 AS BIGINT)) AS pcm
       | FROM events WHERE props IS NOT NULL AND length(props) >= $EnergyWin),
       | wn AS (SELECT media_kind,
       |   list_transform(range(0, len(pcm) // $EnergyWin),
       |     w -> list_reduce(list_transform(pcm[CAST(w * $EnergyWin + 1 AS INTEGER) :
       |       CAST((w + 1) * $EnergyWin AS INTEGER)], x -> x * x), (a, x) -> a + x)) AS wins
       |  FROM m)
       |SELECT media_kind, COUNT(*) AS n_media,
       | CAST(SUM(len(wins)) AS BIGINT) AS n_windows,
       | CAST(SUM(len(list_filter(wins, e -> e < $SilenceThr))) AS BIGINT) AS n_silent,
       | MAX(list_max(wins)) AS max_energy
       |FROM wn GROUP BY media_kind ORDER BY media_kind""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q111 — scene-cut detection over video payloads: the shot-boundary
  // pass a video curation pipeline runs before scene-based sampling
  // (sample per SCENE, not per fixed stride — q49's stride sampler
  // oversamples static shots and misses fast ones). Each 4-byte frame
  // (stride 1 — cut detection needs consecutive frames; 4 bytes so the
  // short test payloads still carry ≥ 2 frames) reduces to a 4-bit sign
  // signature (byte vs exact integer frame mean, the q81 aHash move),
  // and a cut is a Hamming distance ≥ 2 between CONSECUTIVE signatures —
  // integer popcount, no float similarity. The only window partitions by
  // media_id (frames of one video), so parallelism is per-video and a
  // 100 TB corpus shards cleanly; nothing global sorts. Decode is the
  // documented stand-in (payload chars as pixels); a real build swaps
  // the codec at the same column boundary.
  // ===========================================================
  val SceneCutThr = 2
  val FrameLen = 4

  def q111SceneCuts(spark: SparkSession, dir: String): DataFrame = {
    def pixel(i: Int) = s"CAST(ascii(substring(frame.bytes, $i, 1)) AS BIGINT)"
    val sumExpr = (1 to FrameLen).map(pixel).mkString(" + ")
    val hashExpr = (1 to FrameLen).map(i =>
      s"IF(${pixel(i)} * $FrameLen > s, ${1L << (i - 1)}L, 0L)").mkString(" + ")
    val frames = events(spark, dir)
      .select(col("event_id").as("media_id"), col("event_type").as("media_kind"),
        col("props").as("payload"))
      .filter(length(col("payload")) >= 2 * FrameLen) // at least two frames
      .withColumn("frame", explode(expr(
        s"""transform(sequence(0, int(floor((length(payload) - $FrameLen) / $FrameLen))),
           |  i -> struct(i AS idx, substring(payload, i * $FrameLen + 1, $FrameLen) AS bytes))""".stripMargin)))
      .withColumn("s", expr(sumExpr))
      .withColumn("fhash", expr(hashExpr))
      .select(col("media_id"), col("media_kind"),
        col("frame.idx").as("frame_idx"), col("fhash"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    frames
      .withColumn("nexth", lead("fhash", 1).over(w))
      .filter(col("nexth").isNotNull)
      .withColumn("is_cut",
        (expr("bit_count(fhash ^ nexth)") >= SceneCutThr).cast("long"))
      .groupBy("media_kind")
      .agg(
        countDistinct("media_id").as("n_media"),
        count(lit(1)).as("n_pairs"),
        sum("is_cut").as("n_cuts"))
      .withColumn("cut_permille", expr("n_cuts * 1000 DIV n_pairs"))
      .orderBy("media_kind")
  }

  val q111Sql: String = {
    def pixel(i: Int) = s"CAST(ord(substr(bytes, $i, 1)) AS BIGINT)"
    val sumExpr = (1 to FrameLen).map(pixel).mkString(" + ")
    val hashExpr = (1 to FrameLen).map(i =>
      s"CASE WHEN ${pixel(i)} * $FrameLen > s THEN ${1L << (i - 1)} ELSE 0 END").mkString(" + ")
    s"""WITH m AS (SELECT event_id AS media_id, event_type AS media_kind, props AS payload
       |  FROM events WHERE length(props) >= ${2 * FrameLen}),
       | f0 AS (SELECT media_id, media_kind, u.idx AS frame_idx,
       |   substring(payload, u.idx * $FrameLen + 1, $FrameLen) AS bytes
       |  FROM m, LATERAL (SELECT unnest(generate_series(0,
       |    CAST(floor((length(payload) - $FrameLen) / $FrameLen) AS INTEGER))) AS idx) u),
       | f1 AS (SELECT media_id, media_kind, frame_idx, bytes, $sumExpr AS s FROM f0),
       | f2 AS (SELECT media_id, media_kind, frame_idx, $hashExpr AS fhash FROM f1),
       | p AS (SELECT media_id, media_kind, fhash,
       |   LEAD(fhash) OVER (PARTITION BY media_id ORDER BY frame_idx) AS nexth FROM f2),
       | c AS (SELECT media_kind, media_id,
       |   CASE WHEN bit_count(xor(fhash, nexth)) >= $SceneCutThr THEN 1 ELSE 0 END AS is_cut
       |  FROM p WHERE nexth IS NOT NULL)
       |SELECT media_kind, COUNT(DISTINCT media_id) AS n_media, COUNT(*) AS n_pairs,
       | CAST(SUM(is_cut) AS BIGINT) AS n_cuts,
       | CAST(SUM(is_cut) AS BIGINT) * 1000 // COUNT(*) AS cut_permille
       |FROM c GROUP BY media_kind ORDER BY media_kind""".stripMargin.replace("\n", " ")
  }

  // ===========================================================
  // q123 — per-scene KEYFRAME selection: the step after q111's shot-boundary
  // detection in a video curation pipeline. Frames are segmented into scenes
  // (scene id = running count of preceding cuts, same Hamming >= SceneCutThr
  // boundary as q111), then each scene elects one representative frame — the
  // frame with the highest integer "detail" proxy (L1 deviation of its
  // pixels from the frame mean, scaled by FrameLen so the test stays exact
  // integer: Σ_i |p_i·FrameLen − Σp|), tie-broken to the earliest frame.
  //
  // Scale design: every window partitions by media_id (or media_id+scene) —
  // frames of one clip are bounded (minutes × fps), so no partition key is
  // corpus-sized and nothing funnels through a single task. The per-scene
  // argmax is the rn=1 shape the TopKPerKey rewrite turns into map-side
  // bounded heaps. The decode stand-in (payload chars as pixels) swaps for
  // a real codec at the same column boundary, as in q81/q111.
  // ===========================================================
  def q123Keyframes(spark: SparkSession, dir: String): DataFrame = {
    def pixel(i: Int) = s"CAST(ascii(substring(frame.bytes, $i, 1)) AS BIGINT)"
    val sumExpr = (1 to FrameLen).map(pixel).mkString(" + ")
    val hashExpr = (1 to FrameLen).map(i =>
      s"IF(${pixel(i)} * $FrameLen > s, ${1L << (i - 1)}L, 0L)").mkString(" + ")
    val detailExpr = (1 to FrameLen)
      .map(i => s"abs(${pixel(i)} * $FrameLen - s)").mkString(" + ")
    val frames = events(spark, dir)
      .select(col("event_id").as("media_id"), col("event_type").as("media_kind"),
        col("props").as("payload"))
      .filter(length(col("payload")) >= 2 * FrameLen)
      .withColumn("frame", explode(expr(
        s"""transform(sequence(0, int(floor((length(payload) - $FrameLen) / $FrameLen))),
           |  i -> struct(i AS idx, substring(payload, i * $FrameLen + 1, $FrameLen) AS bytes))""".stripMargin)))
      .withColumn("s", expr(sumExpr))
      .withColumn("fhash", expr(hashExpr))
      .withColumn("detail", expr(detailExpr))
      .select(col("media_id"), col("media_kind"),
        col("frame.idx").as("frame_idx"), col("fhash"), col("detail"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    val scened = frames
      .withColumn("prevh", lag("fhash", 1).over(w))
      .withColumn("is_cut", when(col("prevh").isNotNull &&
        expr("bit_count(fhash ^ prevh)") >= SceneCutThr, 1L).otherwise(0L))
      .withColumn("scene", sum("is_cut").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id", "scene")
      .orderBy(col("detail").desc, col("frame_idx"))
    scened
      .withColumn("first_idx", min("frame_idx").over(
        org.apache.spark.sql.expressions.Window.partitionBy("media_id", "scene")))
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") === 1)
      .groupBy("media_kind")
      .agg(countDistinct("media_id").as("n_media"),
        count(lit(1)).as("n_scenes"),
        sum("detail").as("sum_kf_detail"),
        sum(when(col("frame_idx") === col("first_idx"), 1L).otherwise(0L))
          .as("n_kf_first"))
      .orderBy("media_kind")
  }

  val q123Sql: String = {
    def pixel(i: Int) = s"CAST(ord(substr(bytes, $i, 1)) AS BIGINT)"
    val sumExpr = (1 to FrameLen).map(pixel).mkString(" + ")
    val hashExpr = (1 to FrameLen).map(i =>
      s"CASE WHEN ${pixel(i)} * $FrameLen > s THEN ${1L << (i - 1)} ELSE 0 END").mkString(" + ")
    val detailExpr = (1 to FrameLen)
      .map(i => s"abs(${pixel(i)} * $FrameLen - s)").mkString(" + ")
    s"""WITH m AS (SELECT event_id AS media_id, event_type AS media_kind, props AS payload
       |  FROM events WHERE length(props) >= ${2 * FrameLen}),
       | f0 AS (SELECT media_id, media_kind, u.idx AS frame_idx,
       |   substring(payload, u.idx * $FrameLen + 1, $FrameLen) AS bytes
       |  FROM m, LATERAL (SELECT unnest(generate_series(0,
       |    CAST(floor((length(payload) - $FrameLen) / $FrameLen) AS INTEGER))) AS idx) u),
       | f1 AS (SELECT media_id, media_kind, frame_idx, bytes, $sumExpr AS s FROM f0),
       | f2 AS (SELECT media_id, media_kind, frame_idx, $hashExpr AS fhash,
       |   $detailExpr AS detail FROM f1),
       | p AS (SELECT *, LAG(fhash) OVER (PARTITION BY media_id ORDER BY frame_idx) AS prevh
       |  FROM f2),
       | c AS (SELECT *, CASE WHEN prevh IS NOT NULL
       |   AND bit_count(xor(fhash, prevh)) >= $SceneCutThr THEN 1 ELSE 0 END AS is_cut FROM p),
       | sc AS (SELECT *, SUM(is_cut) OVER (PARTITION BY media_id ORDER BY frame_idx
       |   ROWS UNBOUNDED PRECEDING) AS scene FROM c),
       | k AS (SELECT *, MIN(frame_idx) OVER (PARTITION BY media_id, scene) AS first_idx,
       |   ROW_NUMBER() OVER (PARTITION BY media_id, scene
       |    ORDER BY detail DESC, frame_idx) AS rn FROM sc)
       |SELECT media_kind, COUNT(DISTINCT media_id) AS n_media, COUNT(*) AS n_scenes,
       | CAST(SUM(detail) AS BIGINT) AS sum_kf_detail,
       | CAST(SUM(CASE WHEN frame_idx = first_idx THEN 1 ELSE 0 END) AS BIGINT) AS n_kf_first
       |FROM k WHERE rn = 1 GROUP BY media_kind ORDER BY media_kind""".stripMargin.replace("\n", " ")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_keyframes" -> (q123Keyframes _),
    "q111_scene_cuts" -> (q111SceneCuts _),
    "q44_multimodal_meta" -> (q44MultimodalMeta _),
    "q45_decode_features" -> (q45DecodeFeatures _),
    "q49_frame_sample" -> (q49FrameSample _),
    "q81_ahash_neardup" -> (q81AhashNeardup _),
    "q82_audio_energy" -> (q82AudioEnergy _))

  val oracles: Map[String, String] = Map(
    "q123_keyframes" -> q123Sql,
    "q111_scene_cuts" -> q111Sql,
    "q44_multimodal_meta" -> q44Sql,
    "q45_decode_features" -> q45Sql,
    "q49_frame_sample" -> q49Sql,
    "q81_ahash_neardup" -> q81Sql,
    "q82_audio_energy" -> q82Sql)
}
