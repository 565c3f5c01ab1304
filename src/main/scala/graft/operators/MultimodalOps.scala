package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
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
  // path with real partition-parallel plumbing; rows-only oracle since the
  // stub is engine-specific)
  // ===========================================================
  def q45DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.read.parquet(s"$dir/events.parquet")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_multimodal_meta" -> (q44MultimodalMeta _),
    "q45_decode_features" -> (q45DecodeFeatures _))

  val oracles: Map[String, String] = Map(
    "q44_multimodal_meta" -> q44Sql)
}
