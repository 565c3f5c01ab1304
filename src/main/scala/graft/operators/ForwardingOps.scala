package graft.operators

import graft.functions.RoutingColumns
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Data-plane and control-plane operators of the forwarding engine, expressed
 * as batch DataFrame transformations over the `events` table viewed as a
 * message stream. Each query has an exactly-equivalent DuckDB oracle whose
 * SQL is generated from the same model constants (see RoutingColumns), so
 * the engine and the oracle cannot drift.
 *
 * Message derivation (shared by all queries): an event becomes a Kafka-shaped
 * record with topic = event_type, partition = user_id % 8, offset = event_id,
 * plus deterministic dispatch-outcome fields (status/overdue/counters) so the
 * routing decision tree is exercised over every branch.
 *
 * Scale note: every operator here is a pure projection + hash aggregation /
 * window over the message stream — no driver-side loops, no UDFs; all
 * expressions stay inside whole-stage codegen and aggregations are partial
 * (map-side combine) before the single shuffle on the group keys.
 */
object ForwardingOps {

  /** The demo consumer group used to derive queue-topic names. */
  val Group = "grp"
  /** Tier ceilings: tier 1 covers retryCount<=2, tier 2 covers <=4, else DLQ
    * (mirrors RetryUtils cumulative-ceiling walk over sorted tiers). */
  val TierCeilings: Seq[(Int, Long)] = Seq(1 -> 2L, 2 -> 4L)
  val MaxRpcTimeouts = 3

  import RoutingColumns.{codeColumn, codeSql, latencyBucketColumn, latencyBucketSql, statusFromIdColumn, statusFromIdSql}

  /** events with `ts` normalized to epoch-nanos Long (see [[graft.Tables]]);
    * minute bucketing is integer arithmetic on nanos (a double roundtrip
    * would lose precision at 1.7e18). */
  private def events(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)

  /** Shared Kafka-record-shaped projection of the events table. */
  def messages(ev: DataFrame): DataFrame = {
    val c = ev.col _
    ev.select(
      c("event_type").as("topic"),
      pmod(c("user_id"), lit(8)).cast("int").as("partition"),
      c("event_id").as("offset"),
      octet_length(c("props")).cast("long").as("bytes"),
      statusFromIdColumn(c("event_id")).as("status"),
      (c("value") > 0.5).as("overdue"),
      pmod(c("event_id"), lit(8)).as("retry_count"),
      pmod(c("event_id"), lit(5)).as("timeout_count"),
      (pmod(c("user_id"), lit(2)) === 0).as("dlq_token"),
      pmod(c("event_id"), lit(10)).as("role_id"),
      (expr("ts DIV 60000000000") * 60).as("minute_ts"),
      c("value"))
  }

  /** Same projection as a DuckDB CTE body. */
  val messagesSql: String =
    s"""SELECT event_type AS topic, CAST(user_id % 8 AS INTEGER) AS "partition",
       | event_id AS "offset", CAST(octet_length(encode(props)) AS BIGINT) AS bytes,
       | ${statusFromIdSql("event_id")} AS status, value > 0.5 AS overdue,
       | event_id % 8 AS retry_count, event_id % 5 AS timeout_count,
       | (user_id % 2) = 0 AS dlq_token, event_id % 10 AS role_id,
       | CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_ts, value
       |FROM events""".stripMargin.replace("\n", " ")

  private def withCode(msgs: DataFrame): DataFrame =
    msgs.withColumn("code",
      codeColumn(col("status"), col("overdue"), lit(null).cast("string")))

  private val codeSqlExpr: String =
    codeSql("status", "overdue", "CAST(NULL AS VARCHAR)")

  /** BACKOFF escalation on the relative (per-topic) queue layout:
    * role 8 = consumed from DLQ, role 9 = from resq. */
  private def withFinalCode(df: DataFrame): DataFrame =
    df.withColumn("final_code",
      when(col("code") === DispatchCode.Backoff.name,
        when(col("role_id") === 8, DispatchCode.Dlq.name)
          .when(col("role_id") === 9, DispatchCode.Invalid.name)
          .when(col("timeout_count") >= MaxRpcTimeouts && col("dlq_token"),
            DispatchCode.Dlq.name)
          .otherwise(DispatchCode.Retry.name))
        .otherwise(col("code")))

  private val finalCodeSqlExpr: String =
    s"""CASE WHEN code = 'BACKOFF' THEN
       | CASE WHEN role_id = 8 THEN 'DLQ' WHEN role_id = 9 THEN 'INVALID'
       |  WHEN timeout_count >= $MaxRpcTimeouts AND dlq_token THEN 'DLQ'
       |  ELSE 'RETRY' END
       | ELSE code END""".stripMargin.replace("\n", " ")

  /** Per-topic destination: tiered retry walk, DLQ, resq, or ack marker. */
  private def destColumn: org.apache.spark.sql.Column = {
    val retryDest = TierCeilings.foldLeft(None: Option[org.apache.spark.sql.Column]) {
      case (acc, (tier, ceil)) =>
        val t = concat(col("topic"), lit(s"__${Group}__${tier}__retry"))
        Some(acc.fold(when(col("retry_count") <= ceil, t))(_.when(col("retry_count") <= ceil, t)))
    }.get.otherwise(concat(col("topic"), lit(s"__${Group}__dlq")))
    when(col("final_code") === DispatchCode.Retry.name, retryDest)
      .when(col("final_code") === DispatchCode.Dlq.name,
        concat(col("topic"), lit(s"__${Group}__dlq")))
      .when(col("final_code") === DispatchCode.Resq.name,
        concat(col("topic"), lit(s"__${Group}__resq")))
      .otherwise(concat(lit("ack:"), col("final_code")))
  }

  private val destSqlExpr: String = {
    val tierWhens = TierCeilings.map { case (tier, ceil) =>
      s"WHEN retry_count <= $ceil THEN topic || '__${Group}__${tier}__retry'"
    }.mkString(" ")
    s"""CASE WHEN final_code = 'RETRY' THEN
       | (CASE $tierWhens ELSE topic || '__${Group}__dlq' END)
       | WHEN final_code = 'DLQ' THEN topic || '__${Group}__dlq'
       | WHEN final_code = 'RESQ' THEN topic || '__${Group}__resq'
       | ELSE 'ack:' || final_code END""".stripMargin.replace("\n", " ")
  }

  // ===========================================================
  // q01 — response-code distribution (DispatcherResponse histogram;
  // reference: ProcessorImpl.java:287-298)
  // ===========================================================
  def q01CodeDistribution(spark: SparkSession, dir: String): DataFrame =
    withCode(messages(events(spark, dir)))
      .groupBy("code")
      .agg(count(lit(1)).as("n"), sum("bytes").as("total_bytes"))
      .orderBy("code")

  val q01Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | coded AS (SELECT *, $codeSqlExpr AS code FROM msgs)
       |SELECT code, COUNT(*) AS n, CAST(SUM(bytes) AS BIGINT) AS total_bytes
       |FROM coded GROUP BY code ORDER BY code""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q02 — full routing: code -> escalation -> per-row destination topic
  // (the Kafka sink's per-row `topic` column; ProcessorImpl.java:367-394)
  // ===========================================================
  def q02RouteDestinations(spark: SparkSession, dir: String): DataFrame =
    withFinalCode(withCode(messages(events(spark, dir))))
      .withColumn("destination", destColumn)
      .groupBy("destination")
      .agg(count(lit(1)).as("n"), sum("bytes").as("total_bytes"))
      .orderBy("destination")

  val q02Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | coded AS (SELECT *, $codeSqlExpr AS code FROM msgs),
       | esc AS (SELECT *, $finalCodeSqlExpr AS final_code FROM coded),
       | routed AS (SELECT *, $destSqlExpr AS destination FROM esc)
       |SELECT destination, COUNT(*) AS n, CAST(SUM(bytes) AS BIGINT) AS total_bytes
       |FROM routed GROUP BY destination ORDER BY destination""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q03 — timeout escalation outcome distribution
  // (ProcessorImpl.handleTimeout; reference: ProcessorImpl.java:417-465)
  // ===========================================================
  def q03BackoffEscalation(spark: SparkSession, dir: String): DataFrame =
    withFinalCode(withCode(messages(events(spark, dir))))
      .groupBy("final_code")
      .agg(count(lit(1)).as("n"))
      .orderBy("final_code")

  val q03Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | coded AS (SELECT *, $codeSqlExpr AS code FROM msgs),
       | esc AS (SELECT *, $finalCodeSqlExpr AS final_code FROM coded)
       |SELECT final_code, COUNT(*) AS n FROM esc
       |GROUP BY final_code ORDER BY final_code""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q04 — per-topic per-minute throughput (msgs/sec + bytes/sec)
  // (ThroughputTracker; reference: ThroughputTracker.java:11,50-75)
  // ===========================================================
  def q04ThroughputWindow(spark: SparkSession, dir: String): DataFrame =
    messages(events(spark, dir))
      .groupBy("topic", "minute_ts")
      .agg(count(lit(1)).as("n"), sum("bytes").as("total_bytes"))
      .withColumn("msgs_per_sec", col("n") / 60.0)
      .withColumn("bytes_per_sec", col("total_bytes") / 60.0)
      .orderBy("topic", "minute_ts")

  val q04Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | agg AS (
       |  SELECT topic, minute_ts,
       |   COUNT(*) AS n, CAST(SUM(bytes) AS BIGINT) AS total_bytes
       |  FROM msgs GROUP BY topic, minute_ts)
       |SELECT topic, minute_ts, n, total_bytes, n / 60.0 AS msgs_per_sec,
       | total_bytes / 60.0 AS bytes_per_sec
       |FROM agg ORDER BY topic, minute_ts""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q05 — contiguous commit watermark per partition (the ack-tracking
  // queue's relational shadow; reference: LinkedAckTrackingQueue.java:90-150)
  // acked := offset % 3 <> 0; watermark = longest all-acked prefix.
  // ===========================================================
  def q05CommitWatermark(spark: SparkSession, dir: String): DataFrame = {
    val m = messages(events(spark, dir))
      .withColumn("acked", (pmod(col("offset"), lit(3)) =!= 0).cast("int"))
    val w = Window.partitionBy("topic", "partition").orderBy("offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m.withColumn("unacked_so_far", sum(lit(1) - col("acked")).over(w))
      .groupBy("topic", "partition")
      .agg(
        count(lit(1)).as("received"),
        sum("acked").cast("long").as("acked_cnt"),
        sum(when(col("unacked_so_far") === 0, 1).otherwise(0)).cast("long").as("committed_cnt"),
        coalesce(max(when(col("unacked_so_far") === 0, col("offset"))), lit(-1L)).as("commit_offset"))
      .orderBy("topic", "partition")
  }

  val q05Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | acks AS (SELECT topic, "partition", "offset",
       |   CASE WHEN "offset" % 3 <> 0 THEN 1 ELSE 0 END AS acked FROM msgs),
       | pref AS (SELECT *, SUM(1 - acked) OVER
       |   (PARTITION BY topic, "partition" ORDER BY "offset"
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS unacked_so_far
       |  FROM acks)
       |SELECT topic, "partition", COUNT(*) AS received,
       | CAST(SUM(acked) AS BIGINT) AS acked_cnt,
       | CAST(SUM(CASE WHEN unacked_so_far = 0 THEN 1 ELSE 0 END) AS BIGINT) AS committed_cnt,
       | COALESCE(MAX(CASE WHEN unacked_so_far = 0 THEN "offset" END), -1) AS commit_offset
       |FROM pref GROUP BY topic, "partition" ORDER BY topic, partition""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q06 — E2E latency histogram with explicit bucket boundaries
  // (reference: ProcessorImpl.java:120-186, LatencyTracker.java)
  // latency_ms := floor(value * 1000)
  // ===========================================================
  def q06LatencyHistogram(spark: SparkSession, dir: String): DataFrame =
    messages(events(spark, dir))
      .withColumn("latency_ms", floor(col("value") * 1000).cast("long"))
      .withColumn("bucket", latencyBucketColumn(col("latency_ms")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  val q06Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | lat AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS latency_ms FROM msgs),
       | b AS (SELECT ${latencyBucketSql("latency_ms")} AS bucket FROM lat)
       |SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket ORDER BY bucket""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q07 — per-partition checkpoint bookkeeping: fetch offset (max),
  // start offset (min), received count
  // (reference: KafkaCheckpointManager.java, CheckpointInfo.java:9-82)
  // ===========================================================
  def q07CheckpointInfo(spark: SparkSession, dir: String): DataFrame =
    messages(events(spark, dir))
      .groupBy("topic", "partition")
      .agg(
        min("offset").as("start_offset"),
        (max("offset") + 1).as("fetch_offset"),
        count(lit(1)).as("received"))
      .orderBy("topic", "partition")

  val q07Sql: String =
    s"""WITH msgs AS ($messagesSql)
       |SELECT topic, "partition", MIN("offset") AS start_offset,
       | MAX("offset") + 1 AS fetch_offset, COUNT(*) AS received
       |FROM msgs GROUP BY topic, "partition" ORDER BY topic, partition""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q08 — flow-control quota division: a job group's msgs/sec and bytes/sec
  // quota split evenly across its partitions
  // (reference: KafkaPipelineStateManager.java flow merge; FlowControl
  //  defaults 4000 msgs/s, 16 MiB/s per worker: AutoScalarConfiguration.java:21-22)
  // ===========================================================
  def q08FlowControlQuota(spark: SparkSession, dir: String): DataFrame =
    messages(events(spark, dir))
      .groupBy("topic")
      .agg(countDistinct("partition").as("partitions"))
      .withColumn("msgs_per_sec_per_partition", lit(4000.0) / col("partitions"))
      .withColumn("bytes_per_sec_per_partition", lit(16777216.0) / col("partitions"))
      .orderBy("topic")

  val q08Sql: String =
    s"""WITH msgs AS ($messagesSql)
       |SELECT topic, COUNT(DISTINCT "partition") AS partitions,
       | 4000.0 / COUNT(DISTINCT "partition") AS msgs_per_sec_per_partition,
       | 16777216.0 / COUNT(DISTINCT "partition") AS bytes_per_sec_per_partition
       |FROM msgs GROUP BY topic ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q09 — expected vs actual job reconciliation -> command matrix
  // (CommandListBuilder full-outer join; reference:
  //  uforwarder-core/.../controller/rpc/CommandListBuilder.java:29-103)
  // expected := job groups whose min offset % 3 <> 0 (RUNNING expected)
  // actual   := job groups whose max offset % 2 = 0 (RUNNING actual)
  // ===========================================================
  def q09ReconcileCommands(spark: SparkSession, dir: String): DataFrame = {
    val g = messages(events(spark, dir))
      .groupBy("topic", "partition")
      .agg(min("offset").as("mn"), max("offset").as("mx"))
    val expected = g.filter(pmod(col("mn"), lit(3)) =!= 0)
      .select(col("topic"), col("partition"), lit(true).as("expected"))
    val actual = g.filter(pmod(col("mx"), lit(2)) === 0)
      .select(col("topic"), col("partition"), lit(true).as("actual"))
    expected.join(actual, Seq("topic", "partition"), "full_outer")
      .withColumn("command",
        when(col("actual").isNull, "RUN_JOB")
          .when(col("expected").isNull, "CANCEL_JOB")
          .otherwise("NOOP"))
      .select("topic", "partition", "command")
      .orderBy("topic", "partition")
  }

  val q09Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | g AS (SELECT topic, "partition", MIN("offset") AS mn, MAX("offset") AS mx
       |   FROM msgs GROUP BY topic, "partition"),
       | expected AS (SELECT topic, "partition", TRUE AS expected FROM g WHERE mn % 3 <> 0),
       | actual AS (SELECT topic, "partition", TRUE AS actual FROM g WHERE mx % 2 = 0)
       |SELECT COALESCE(e.topic, a.topic) AS topic,
       | COALESCE(e."partition", a."partition") AS "partition",
       | CASE WHEN a.actual IS NULL THEN 'RUN_JOB'
       |  WHEN e.expected IS NULL THEN 'CANCEL_JOB' ELSE 'NOOP' END AS command
       |FROM expected e FULL OUTER JOIN actual a
       | ON e.topic = a.topic AND e."partition" = a."partition"
       |ORDER BY topic, partition""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q10 — partition-expansion diff: old vs new assignment anti-joins
  // (reference: AbstractKafkaFetcherThread.extractTopicPartitionMap:598-685,
  //  KafkaPartitionExpansionWatcher.java:33-60)
  // Fine-grained assignment: partition := user_id (wide id space so both
  // sides of the diff are non-empty). old := assignments seen in the first
  // tenth of each topic's stream (offset*10 <= max), new := the rest.
  // ===========================================================
  def q10PartitionDiff(spark: SparkSession, dir: String): DataFrame = {
    val m = events(spark, dir).select(
      col("event_type").as("topic"),
      col("user_id").cast("int").as("partition"),
      col("event_id").as("offset"))
    val half = m.groupBy("topic").agg(max("offset").as("mx"))
    // single-shuffle formulation: one aggregation computes membership flags
    // for both halves; the anti-join semantics become cheap filters on the
    // aggregated (topic, partition) rows (the two-anti-join version costs 4
    // extra exchanges of the full fact table at scale)
    val flags = m.join(broadcast(half), "topic")
      .groupBy("topic", "partition")
      .agg(
        max(when(col("offset") * 10 <= col("mx"), 1).otherwise(0)).as("in_old"),
        max(when(col("offset") * 10 > col("mx"), 1).otherwise(0)).as("in_new"))
    val added = flags.filter(col("in_new") === 1 && col("in_old") === 0)
      .select(col("topic"), col("partition"), lit("ADDED").as("change"))
    val removed = flags.filter(col("in_old") === 1 && col("in_new") === 0)
      .select(col("topic"), col("partition"), lit("REMOVED").as("change"))
    added.unionByName(removed).orderBy("topic", "partition", "change")
  }

  val q10Sql: String =
    s"""WITH m AS (SELECT event_type AS topic, CAST(user_id AS INTEGER) AS "partition",
       |   event_id AS "offset" FROM events),
       | half AS (SELECT topic, MAX("offset") AS mx FROM m GROUP BY topic),
       | j AS (SELECT m.topic, m."partition", m."offset", h.mx FROM m JOIN half h ON m.topic = h.topic),
       | old AS (SELECT DISTINCT topic, "partition" FROM j WHERE "offset" * 10 <= mx),
       | nw AS (SELECT DISTINCT topic, "partition" FROM j WHERE "offset" * 10 > mx),
       | added AS (SELECT n.topic, n."partition", 'ADDED' AS change FROM nw n
       |   WHERE NOT EXISTS (SELECT 1 FROM old o WHERE o.topic = n.topic AND o."partition" = n."partition")),
       | removed AS (SELECT o.topic, o."partition", 'REMOVED' AS change FROM old o
       |   WHERE NOT EXISTS (SELECT 1 FROM nw n WHERE n.topic = o.topic AND n."partition" = o."partition"))
       |SELECT * FROM (SELECT * FROM added UNION ALL SELECT * FROM removed)
       |ORDER BY topic, "partition", change""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q11 — autoscaler percentile windows: p50/p99 of per-minute throughput
  // per topic, scale = max(msgs/4000, bytes/16MiB)
  // (reference: ScaleWindow.getByPercentile, ScaleState.java:353-440,
  //  AutoScalarConfiguration.java:11-27; ScaleConverter max rule :60-63)
  // ===========================================================
  def q11ScalePercentiles(spark: SparkSession, dir: String): DataFrame =
    messages(events(spark, dir))
      .groupBy("topic", "minute_ts")
      .agg(count(lit(1)).as("n"), sum("bytes").cast("double").as("b"))
      .groupBy("topic")
      .agg(
        expr("percentile(n, 0.5)").as("p50_msgs_per_min"),
        expr("percentile(n, 0.99)").as("p99_msgs_per_min"),
        expr("percentile(b, 0.5)").as("p50_bytes_per_min"))
      .withColumn("scale", round(
        greatest(
          col("p50_msgs_per_min") / 60.0 / 4000.0,
          col("p50_bytes_per_min") / 60.0 / 16777216.0), 8))
      .withColumn("p50_msgs_per_min", round(col("p50_msgs_per_min"), 6))
      .withColumn("p99_msgs_per_min", round(col("p99_msgs_per_min"), 6))
      .withColumn("p50_bytes_per_min", round(col("p50_bytes_per_min"), 6))
      .orderBy("topic")

  val q11Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | perMin AS (SELECT topic, minute_ts,
       |   COUNT(*) AS n, CAST(SUM(bytes) AS DOUBLE) AS b
       |  FROM msgs GROUP BY topic, minute_ts),
       | pct AS (SELECT topic,
       |   quantile_cont(n, 0.5) AS p50_msgs_per_min,
       |   quantile_cont(n, 0.99) AS p99_msgs_per_min,
       |   quantile_cont(b, 0.5) AS p50_bytes_per_min
       |  FROM perMin GROUP BY topic)
       |SELECT topic, round(p50_msgs_per_min, 6) AS p50_msgs_per_min,
       | round(p99_msgs_per_min, 6) AS p99_msgs_per_min,
       | round(p50_bytes_per_min, 6) AS p50_bytes_per_min,
       | round(greatest(p50_msgs_per_min / 60.0 / 4000.0,
       |   p50_bytes_per_min / 60.0 / 16777216.0), 8) AS scale
       |FROM pct ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q12 — audit: exact distinct counts per topic
  // (AUDIT_TYPE_EXACT_UNIQ, spec-only in the reference: job.proto:313-334)
  // ===========================================================
  def q12AuditExactUniq(spark: SparkSession, dir: String): DataFrame =
    messages(events(spark, dir))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("n"),
        countDistinct("offset").as("uniq_offsets"),
        countDistinct(col("partition")).as("uniq_partitions"))
      .orderBy("topic")

  val q12Sql: String =
    s"""WITH msgs AS ($messagesSql)
       |SELECT topic, COUNT(*) AS n, COUNT(DISTINCT "offset") AS uniq_offsets,
       | COUNT(DISTINCT "partition") AS uniq_partitions
       |FROM msgs GROUP BY topic ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q13 — bounded DLQ merge/purge: per partition, consume only
  // [start_offset, end_offset); purge partitions (partition % 4 = 0) have
  // start == end and consume nothing
  // (reference: DlqTopicKafkaFetcher.java:66-79,103-115; CheckpointInfo.bounded)
  // start := (partition + 1) * 50, end := start + 300 (0 for purge)
  // ===========================================================
  def q13BoundedDlqMerge(spark: SparkSession, dir: String): DataFrame = {
    val m = messages(events(spark, dir))
      .withColumn("start_offset", (col("partition") + 1) * 50)
      .withColumn("end_offset",
        when(pmod(col("partition"), lit(4)) === 0, (col("partition") + 1) * 50)
          .otherwise((col("partition") + 1) * 50 + 300))
    m.filter(col("offset") >= col("start_offset") && col("offset") < col("end_offset"))
      .groupBy("topic", "partition")
      .agg(count(lit(1)).as("merged"), min("offset").as("lo"), max("offset").as("hi"))
      .orderBy("topic", "partition")
  }

  val q13Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | b AS (SELECT *, ("partition" + 1) * 50 AS start_offset,
       |   CASE WHEN "partition" % 4 = 0 THEN ("partition" + 1) * 50
       |    ELSE ("partition" + 1) * 50 + 300 END AS end_offset
       |  FROM msgs)
       |SELECT topic, "partition", COUNT(*) AS merged, MIN("offset") AS lo, MAX("offset") AS hi
       |FROM b WHERE "offset" >= start_offset AND "offset" < end_offset
       |GROUP BY topic, "partition" ORDER BY topic, partition""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q14 — literal-spec tier selection (spec-driven codegen parity check:
  // the Column chain and the SQL CASE are generated from the same JobSpec)
  // ===========================================================
  val literalSpec: JobSpec = JobSpec(
    jobGroupId = s"events__$Group", cluster = "local", topic = "events",
    consumerGroup = Group,
    rpc = RpcSpec("grpc://consumer", s"kafka.consumerproxy.$Group/events",
      maxRpcTimeouts = MaxRpcTimeouts, dlqTopic = TopicNames.dlq("events", Group)),
    retryEnabled = true,
    retryTiers = TierCeilings.map { case (tier, ceil) =>
      RetryTier(TopicNames.retry("events", Group, tier), tier * 1000L, ceil.toInt)
    })

  def q14TierSelect(spark: SparkSession, dir: String): DataFrame =
    messages(events(spark, dir))
      .withColumn("retry_destination",
        RoutingColumns.retryDestinationColumn(literalSpec, col("retry_count")))
      .groupBy("retry_destination")
      .agg(count(lit(1)).as("n"))
      .orderBy("retry_destination")

  val q14Sql: String =
    s"""WITH msgs AS ($messagesSql)
       |SELECT ${RoutingColumns.retryDestinationSql(literalSpec, "retry_count")} AS retry_destination,
       | COUNT(*) AS n
       |FROM msgs GROUP BY retry_destination ORDER BY retry_destination""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q15 — audit: approximate distinct counts per topic
  // (AUDIT_TYPE_APPROX_UNIQ, spec-only in the reference: job.proto:313-334).
  // Estimator: KMV sketch (graft.functions.KmvSketch, bounded-state typed
  // Aggregator with map-side partial merge) over a 60-bit md5-derived hash.
  // Unlike HLL (whose estimates are implementation-specific by design), the
  // KMV estimate is a pure function of the k smallest distinct hashes, so an
  // independent engine computing the same hashes reproduces it bit-for-bit —
  // this audit gets a REAL oracle. approx_count_distinct (HLL) stays covered
  // by ForwardingOpsSpec, which bounds it against the exact count.
  // ===========================================================
  def q15AuditApproxUniq(spark: SparkSession, dir: String): DataFrame =
    messages(events(spark, dir))
      // 60-bit hash = 15 hex chars of md5 of the decimal-string offset:
      // exactly representable as a non-negative BIGINT in any engine
      .withColumn("h",
        graft.plans.TextKernels.md5_prefix60(col("offset").cast("string").cast("binary")))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("n"),
        graft.functions.KmvSketch.kmv_estimate(col("h")).as("approx_uniq_offsets"),
        countDistinct("offset").as("exact_uniq_offsets"))
      .withColumn("rel_err",
        abs(col("approx_uniq_offsets") - col("exact_uniq_offsets").cast("double")) /
          col("exact_uniq_offsets"))
      .orderBy("topic")

  /** Oracle: the KMV estimate recomputed in plain SQL — k smallest distinct
    * hashes per topic via a window, then (k-1)*2^60/h_(k) in the same two
    * double ops as KmvSketch.finish. */
  val q15Sql: String = {
    val k = 256
    s"""WITH m AS (SELECT event_type AS topic, event_id AS off,
       |  CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       | FROM events),
       | counts AS (SELECT topic, COUNT(*) AS n, COUNT(DISTINCT off) AS exact_uniq_offsets
       |  FROM m GROUP BY topic),
       | dh AS (SELECT DISTINCT topic, h FROM m),
       | ranked AS (SELECT topic, h, ROW_NUMBER() OVER (PARTITION BY topic ORDER BY h) AS rn
       |  FROM dh),
       | kmv AS (SELECT topic,
       |   CASE WHEN COUNT(*) < $k THEN CAST(COUNT(*) AS DOUBLE)
       |        ELSE CAST(${k - 1} AS DOUBLE) * 1152921504606846976.0 / CAST(MAX(CASE WHEN rn = $k THEN h END) AS DOUBLE)
       |   END AS approx_uniq_offsets
       |  FROM ranked WHERE rn <= $k GROUP BY topic)
       |SELECT topic, n, approx_uniq_offsets, exact_uniq_offsets,
       | abs(approx_uniq_offsets - CAST(exact_uniq_offsets AS DOUBLE)) / exact_uniq_offsets AS rel_err
       |FROM counts JOIN kmv USING (topic) ORDER BY topic""".stripMargin.replace("\n", " ")
  }

  // ===========================================================
  // q18 — skew-safe aggregation: the events stream has only 5 topics, so a
  // plain groupBy(topic) funnels 20% of all rows into single reducers. The
  // two-stage salted aggregation (partial per (topic, salt), then re-agg)
  // bounds any single reducer's input at 1/SaltBuckets of a key's rows —
  // the standard hot-key pattern at 100 TB. Results are identical to the
  // plain aggregation, which is exactly what the oracle checks.
  // ===========================================================
  val SaltBuckets = 16

  def q18SaltedHotKeyAgg(spark: SparkSession, dir: String): DataFrame =
    messages(events(spark, dir))
      .withColumn("salt", pmod(col("offset"), lit(SaltBuckets)))
      .groupBy("topic", "salt")
      .agg(
        count(lit(1)).as("pn"),
        sum("bytes").as("pbytes"),
        max("offset").as("pmax"))
      .groupBy("topic")
      .agg(
        sum("pn").cast("long").as("n"),
        sum("pbytes").cast("long").as("total_bytes"),
        max("pmax").as("max_offset"))
      .orderBy("topic")

  val q18Sql: String =
    s"""WITH msgs AS ($messagesSql)
       |SELECT topic, COUNT(*) AS n, CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       | MAX("offset") AS max_offset
       |FROM msgs GROUP BY topic ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q64 — sketched hot-key detection: Misra-Gries candidates + exact
  // verification. The reference detects hot keys reactively (head-of-line
  // blocking stats per ack queue, BlockingQueueStubManager.java:43-376);
  // at 100 TB the proactive form cannot be groupBy(key).count() — that
  // shuffles every distinct key. The MG sketch keeps k counters per map
  // task (bounded state, map-side combinable), its candidate set provably
  // contains every key above n/(k+1), and one exact aggregation restricted
  // to the (broadcast) candidates verifies them. Result = keys whose EXACT
  // frequency clears the threshold — deterministic even though sketch
  // internals depend on merge order.
  // ===========================================================
  val HhSketchK = 127 // threshold n/128: sits below the events hot tail

  def q64HotKeys(spark: SparkSession, dir: String): DataFrame = {
    // nulls are excluded EXPLICITLY: the typed Aggregator's primitive Long
    // input would silently fold a NULL key to 0L, diverging from any
    // engine that groups NULL separately — make the precondition part of
    // the query instead of an encoder accident
    val ev = events(spark, dir).filter(col("user_id").isNotNull)
    // ONE corpus pass yields both the candidate sketch and the exact total
    // (the threshold denominator); the only other scan is the verification
    // pass restricted to broadcast candidates — two scans, not three
    val cands = ev.agg(
        graft.functions.MisraGries.mg_candidates(col("user_id"), HhSketchK).as("ks"),
        count(lit(1)).as("total"))
      .select(col("total"), explode(col("ks")).as("user_id"))
    ev.join(broadcast(cands), Seq("user_id"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), first("total").as("total"))
      .filter(col("n_events") * (HhSketchK + 1) > col("total"))
      .select("user_id", "n_events")
      .orderBy(col("n_events").desc, col("user_id"))
  }

  /** Oracle: the exact heavy hitters — the sketch's candidate superset plus
    * exact verification must land on precisely this set. */
  val q64Sql: String =
    s"""WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
       | c AS (SELECT user_id, COUNT(*) AS n_events FROM e GROUP BY user_id),
       | t AS (SELECT COUNT(*) AS total FROM e)
       |SELECT user_id, n_events FROM c, t
       |WHERE n_events * ${HhSketchK + 1} > total
       |ORDER BY n_events DESC, user_id""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q70 — throughput trend per topic: integer least-squares slope over
  // per-minute message counts — the predictive input the autoscaler's
  // windowed-percentile machinery (ScaleWindow.java:49-56) lacks: is load
  // RISING or FALLING, not just where it sits. Buckets aggregate first
  // (one map-side-combinable shuffle; the regression then runs on
  // #topics × #minutes rows, not messages). x is the minute index
  // RELATIVE to each topic's first bucket, keeping every regression sum
  // comfortably in int64; slope sign = sign(n·Σxy − Σx·Σy) because the
  // denominator n·Σxx − (Σx)² = n²·var(x) ≥ 0. All sums are exact
  // integers — no float regression aggregates, so the oracle
  // hash-matches bit-for-bit. (At extreme bucket×count magnitudes the
  // sums upgrade to DECIMAL(38,0) unchanged in both engines.)
  // ===========================================================
  def q70ThroughputTrend(spark: SparkSession, dir: String): DataFrame = {
    val buckets = messages(events(spark, dir))
      .groupBy("topic", "minute_ts")
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy("topic")
    buckets
      .withColumn("mn", min("minute_ts").over(w))
      .withColumn("x", expr("(minute_ts - mn) DIV 60"))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(
        col("topic"), col("n_buckets"),
        (col("n_buckets") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n_buckets") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
        signum((col("n_buckets") * col("sxy") - col("sx") * col("sy")).cast("double"))
          .cast("long").as("trend"))
      .orderBy("topic")
  }

  val q70Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | b AS (SELECT topic, minute_ts, COUNT(*) AS y FROM msgs GROUP BY topic, minute_ts),
       | xb AS (SELECT topic, (minute_ts - MIN(minute_ts) OVER (PARTITION BY topic)) // 60 AS x, y FROM b),
       | s AS (SELECT topic, COUNT(*) AS n_buckets, SUM(x) AS sx, SUM(y) AS sy,
       |   SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM xb GROUP BY topic)
       |SELECT topic, n_buckets,
       | CAST(n_buckets * sxy - sx * sy AS BIGINT) AS slope_num,
       | CAST(n_buckets * sxx - sx * sx AS BIGINT) AS slope_den,
       | CAST(sign(n_buckets * sxy - sx * sy) AS BIGINT) AS trend
       |FROM s ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q79 — Z-order layout: interleave the bits of two dimensions into one
  // locality-preserving sort key, the data-layout move behind multi-
  // dimensional zone-map pruning (Delta OPTIMIZE ZORDER, Hudi/Iceberg
  // clustering). At 100 TB you range-partition the write by zval so every
  // file's (x, y) bounding box is tight and a filter on EITHER dimension
  // prunes files; here the query materializes the per-bucket bounding
  // boxes — the pruning-quality diagnostic itself. The interleave is
  // pure codegen'd shift/mask arithmetic GENERATED FROM THE SAME loop for
  // the Column tree and the SQL oracle, so the engines cannot drift.
  // ===========================================================
  val ZBits = 8

  private def zInterleave(x: String, y: String): org.apache.spark.sql.Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftrightunsigned(col(x), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(col(y), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _) // bit-disjoint terms: + is OR

  private def zInterleaveSql(x: String, y: String): String =
    (0 until ZBits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  def q79ZorderLayout(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("user_id").bitwiseAND(lit(255L)).as("x"),
        floor(col("value") * 256).cast("long").bitwiseAND(lit(255L)).as("y"))
      .withColumn("zval", zInterleave("x", "y"))
      .withColumn("bucket", expr("zval DIV 1024"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
      .withColumn("bbox_area",
        ((col("x_max") - col("x_min") + 1) * (col("y_max") - col("y_min") + 1)).cast("long"))
      .orderBy("bucket")

  val q79Sql: String =
    s"""WITH d AS (SELECT user_id & 255 AS x,
       |  CAST(floor(value * 256) AS BIGINT) & 255 AS y FROM events),
       | z AS (SELECT x, y, ${zInterleaveSql("x", "y")} AS zval FROM d)
       |SELECT zval // 1024 AS bucket, COUNT(*) AS n,
       | MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max,
       | CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS BIGINT) AS bbox_area
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q80 — partition-load Gini per topic: the skew diagnostic feeding the
  // rebalancer (RpcJobColocatingRebalancer's load-aware moves need exactly
  // this signal: HOW unevenly is a topic's load spread over partitions).
  // Exact integer fixed-point: with loads sorted ascending and 1-indexed,
  // G·1000 = (2·Σi·xᵢ − (n+1)·Σxᵢ)·1000 DIV (n·Σxᵢ) — one integer
  // division at the end, no float accumulation, so the oracle
  // hash-matches. The per-topic window sorts PARTITION counts (tiny — the
  // heavy aggregation below it is map-side-combined over messages).
  // ===========================================================
  def q80LoadGini(spark: SparkSession, dir: String): DataFrame = {
    val loads = messages(events(spark, dir))
      .groupBy("topic", "partition")
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("topic").orderBy(col("x"), col("partition"))
    loads
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy("topic")
      .agg(count(lit(1)).as("n_partitions"),
        sum("x").cast("long").as("total_msgs"),
        sum(col("rn") * col("x")).cast("long").as("sixi"))
      .withColumn("gini_millis", expr(
        "(2 * sixi - (n_partitions + 1) * total_msgs) * 1000 DIV (n_partitions * total_msgs)"))
      .select("topic", "n_partitions", "total_msgs", "gini_millis")
      .orderBy("topic")
  }

  val q80Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | loads AS (SELECT topic, "partition", COUNT(*) AS x FROM msgs GROUP BY topic, "partition"),
       | r AS (SELECT topic, x,
       |   CAST(ROW_NUMBER() OVER (PARTITION BY topic ORDER BY x, "partition") AS BIGINT) AS rn
       |  FROM loads),
       | s AS (SELECT topic, COUNT(*) AS n_partitions, CAST(SUM(x) AS BIGINT) AS total_msgs,
       |   CAST(SUM(rn * x) AS BIGINT) AS sixi FROM r GROUP BY topic)
       |SELECT topic, n_partitions, total_msgs,
       | (2 * sixi - (n_partitions + 1) * total_msgs) * 1000 // (n_partitions * total_msgs) AS gini_millis
       |FROM s ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q83 — incremental aggregate maintenance: partial aggregation STATES
  // from two snapshots (offset-parity halves standing in for "yesterday's
  // rollup" + "today's delta") merged algebraically into the exact full
  // result — counts/sums add, min/min, max/max, and the KMV distinct
  // sketch merges as smallest-k-of-distinct-union (SmallestK state IS the
  // KMV state). This is the pattern that makes 100 TB rollups incremental:
  // never rescan history, re-aggregate states. The oracle computes the
  // DIRECT aggregation — the merge must land on it exactly, estimate
  // included.
  // ===========================================================
  val KmvK = 256

  def q83AggStateMerge(spark: SparkSession, dir: String): DataFrame = {
    val m = messages(events(spark, dir))
      .withColumn("h",
        graft.plans.TextKernels.md5_prefix60(col("offset").cast("string").cast("binary")))
      .withColumn("half", pmod(col("offset"), lit(2)))
    val parts = m.groupBy("topic", "half").agg(
      count(lit(1)).as("pn"),
      sum("bytes").as("pb"),
      min("offset").as("pmn"),
      max("offset").as("pmx"),
      graft.functions.SmallestK.smallest_k(col("h"), KmvK).as("pkmv"))
    parts.groupBy("topic").agg(
      sum("pn").cast("long").as("n"),
      sum("pb").cast("long").as("total_bytes"),
      min("pmn").as("min_offset"),
      max("pmx").as("max_offset"),
      expr(s"slice(array_sort(array_distinct(flatten(collect_list(pkmv)))), 1, $KmvK)")
        .as("kmv"))
      .withColumn("approx_uniq",
        when(size(col("kmv")) < KmvK, size(col("kmv")).cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * lit(1152921504606846976.0) /
            element_at(col("kmv"), KmvK).cast("double")))
      .select("topic", "n", "total_bytes", "min_offset", "max_offset", "approx_uniq")
      .orderBy("topic")
  }

  /** Oracle: the direct (non-incremental) aggregation, KMV estimate in the
    * exact arithmetic of the merge path. */
  val q83Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | m AS (SELECT topic, "offset" AS off, bytes,
       |   CAST(('0x' || substr(md5(CAST("offset" AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM msgs),
       | base AS (SELECT topic, COUNT(*) AS n, CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       |   MIN(off) AS min_offset, MAX(off) AS max_offset FROM m GROUP BY topic),
       | dh AS (SELECT DISTINCT topic, h FROM m),
       | rk AS (SELECT topic, h, ROW_NUMBER() OVER (PARTITION BY topic ORDER BY h) AS rn FROM dh),
       | kmv AS (SELECT topic,
       |   CASE WHEN COUNT(*) < $KmvK THEN CAST(COUNT(*) AS DOUBLE)
       |        ELSE CAST(${KmvK - 1} AS DOUBLE) * 1152921504606846976.0 /
       |          CAST(MAX(CASE WHEN rn = $KmvK THEN h END) AS DOUBLE) END AS approx_uniq
       |  FROM rk WHERE rn <= $KmvK GROUP BY topic)
       |SELECT topic, n, total_bytes, min_offset, max_offset, approx_uniq
       |FROM base JOIN kmv USING (topic) ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q85 — mergeable histogram quantiles: p50/p95/p99 upper bounds from a
  // fixed-bucket integer histogram — the quantile form that STREAMS and
  // MERGES (bucket counts add across partitions/windows), unlike the exact
  // per-group sort behind q11. One map-side-combinable aggregation to
  // 20 buckets per topic, then a tiny cumulative window over #topics×20
  // rows picks the first bucket whose cumulative share clears each
  // percentile — integer arithmetic end to end (cum·100 ≥ n·p), no float
  // ranks, exact oracle parity. Precision is the bucket width (50 value-
  // millis), the standard latency-SLO histogram trade (the reference's
  // E2E_DURATION_BUCKETS makes exactly this trade, ProcessorImpl.java:120).
  // ===========================================================
  val QBucketMillis = 50L

  def q85HistogramQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val h = messages(events(spark, dir))
      .withColumn("b", expr(s"CAST(floor(value * 1000) AS BIGINT) DIV $QBucketMillis"))
      .groupBy("topic", "b")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("topic").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("cum", sum("c").over(w))
      .withColumn("tot", sum("c").over(Window.partitionBy("topic")))
      .groupBy("topic")
      .agg(
        max("tot").cast("long").as("n"),
        min(when(col("cum") * 100 >= col("tot") * 50, col("b"))).as("b50"),
        min(when(col("cum") * 100 >= col("tot") * 95, col("b"))).as("b95"),
        min(when(col("cum") * 100 >= col("tot") * 99, col("b"))).as("b99"))
      .select(col("topic"), col("n"),
        ((col("b50") + 1) * QBucketMillis).as("p50_ub_millis"),
        ((col("b95") + 1) * QBucketMillis).as("p95_ub_millis"),
        ((col("b99") + 1) * QBucketMillis).as("p99_ub_millis"))
      .orderBy("topic")
  }

  val q85Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | hb AS (SELECT topic, CAST(floor(value * 1000) AS BIGINT) // $QBucketMillis AS b,
       |   COUNT(*) AS c FROM msgs GROUP BY topic, b),
       | cw AS (SELECT topic, b, c,
       |   SUM(c) OVER (PARTITION BY topic ORDER BY b
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |   SUM(c) OVER (PARTITION BY topic) AS tot FROM hb),
       | q AS (SELECT topic, CAST(MAX(tot) AS BIGINT) AS n,
       |   MIN(CASE WHEN cum * 100 >= tot * 50 THEN b END) AS b50,
       |   MIN(CASE WHEN cum * 100 >= tot * 95 THEN b END) AS b95,
       |   MIN(CASE WHEN cum * 100 >= tot * 99 THEN b END) AS b99
       |  FROM cw GROUP BY topic)
       |SELECT topic, n, (b50 + 1) * $QBucketMillis AS p50_ub_millis,
       | (b95 + 1) * $QBucketMillis AS p95_ub_millis,
       | (b99 + 1) * $QBucketMillis AS p99_ub_millis
       |FROM q ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q89 — ingestion-gap detection: minutes with NO traffic per topic — the
  // monitoring query behind "did the fetcher stall?" (the reference's
  // health-state machinery reacts to exactly this signal). A lead()
  // window over each topic's OBSERVED minute buckets finds gaps as
  // bucket-successor jumps — O(#buckets) rows through the window, never a
  // dense calendar spine joined against the corpus (generate_series ×
  // topics at 100 TB is a cross join of doom). Output: each gap with its
  // span, plus per-topic gap totals via a grouping-sets-style union.
  // ===========================================================
  def q89GapDetection(spark: SparkSession, dir: String): DataFrame = {
    val buckets = messages(events(spark, dir))
      .groupBy("topic", "minute_ts")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("topic").orderBy("minute_ts")
    buckets
      .withColumn("next_ts", lead("minute_ts", 1).over(w))
      .filter(col("next_ts").isNotNull && col("next_ts") > col("minute_ts") + 60)
      .withColumn("missing", ((col("next_ts") - col("minute_ts")) / 60 - 1).cast("long"))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("n_gaps"),
        sum("missing").cast("long").as("missing_minutes"),
        max("missing").as("max_gap_minutes"),
        min("minute_ts").as("first_gap_start"),
        max("next_ts").as("last_gap_end"))
      .orderBy("topic")
  }

  val q89Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | b AS (SELECT topic, minute_ts, COUNT(*) AS c FROM msgs GROUP BY topic, minute_ts),
       | g AS (SELECT topic, minute_ts,
       |   LEAD(minute_ts) OVER (PARTITION BY topic ORDER BY minute_ts) AS next_ts FROM b),
       | gaps AS (SELECT topic, minute_ts, next_ts,
       |   CAST((next_ts - minute_ts) / 60 - 1 AS BIGINT) AS missing
       |  FROM g WHERE next_ts IS NOT NULL AND next_ts > minute_ts + 60)
       |SELECT topic, COUNT(*) AS n_gaps, CAST(SUM(missing) AS BIGINT) AS missing_minutes,
       | MAX(missing) AS max_gap_minutes, MIN(minute_ts) AS first_gap_start,
       | MAX(next_ts) AS last_gap_end
       |FROM gaps GROUP BY topic ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q90 — distribution-drift statistic between two ingestion windows: the
  // chi-square drift monitor an ML data pipeline runs between "reference"
  // and "current" slices before retraining. Expected counts come from the
  // reference window scaled to the current window's mass; the statistic
  // is Σ (o·S − e·S)² DIV (e·S·S) in exact integer fixed point (S = 10³
  // scale), so both engines agree bit-for-bit — no float chi-square.
  // One scan builds both windows' histograms (conditional aggregation on
  // the time split), map-side combined; the statistic reduces per topic.
  // ===========================================================
  val DriftScale = 1000L

  def q90DriftStat(spark: SparkSession, dir: String): DataFrame = {
    val m = messages(events(spark, dir))
      .withColumn("bucket", expr("CAST(floor(value * 10) AS BIGINT)"))
      .withColumn("win", expr("CAST(`offset` % 2 AS INT)")) // deterministic window split
    val h = m.groupBy("topic", "bucket")
      .agg(
        sum(when(col("win") === 0, 1L).otherwise(0L)).as("ref_c"),
        sum(when(col("win") === 1, 1L).otherwise(0L)).as("cur_c"))
    val tot = h.groupBy("topic")
      .agg(sum("ref_c").cast("long").as("ref_n"), sum("cur_c").cast("long").as("cur_n"))
    h.join(tot, "topic")
      .filter(col("ref_c") > 0) // buckets unseen in the reference are reported separately
      .withColumn("e1000", expr(s"ref_c * cur_n * $DriftScale DIV ref_n"))
      .withColumn("contrib", expr(
        s"(cur_c * $DriftScale - e1000) * (cur_c * $DriftScale - e1000) DIV (e1000 * $DriftScale)"))
      .groupBy("topic")
      .agg(
        max("ref_n").as("ref_n"), max("cur_n").as("cur_n"),
        sum("contrib").cast("long").as("chi2_millis"),
        count(lit(1)).as("n_buckets"))
      .orderBy("topic")
  }

  val q90Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | m AS (SELECT topic, CAST(floor(value * 10) AS BIGINT) AS bucket,
       |   CAST("offset" % 2 AS INTEGER) AS win FROM msgs),
       | h AS (SELECT topic, bucket,
       |   CAST(SUM(CASE WHEN win = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ref_c,
       |   CAST(SUM(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cur_c
       |  FROM m GROUP BY topic, bucket),
       | tot AS (SELECT topic, CAST(SUM(ref_c) AS BIGINT) AS ref_n,
       |   CAST(SUM(cur_c) AS BIGINT) AS cur_n FROM h GROUP BY topic),
       | c AS (SELECT h.topic, ref_n, cur_n,
       |   ref_c * cur_n * $DriftScale // ref_n AS e1000, cur_c
       |  FROM h JOIN tot ON h.topic = tot.topic WHERE ref_c > 0)
       |SELECT topic, MAX(ref_n) AS ref_n, MAX(cur_n) AS cur_n,
       | CAST(SUM((cur_c * $DriftScale - e1000) * (cur_c * $DriftScale - e1000)
       |   // (e1000 * $DriftScale)) AS BIGINT) AS chi2_millis,
       | COUNT(*) AS n_buckets
       |FROM c GROUP BY topic ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q93 — log compaction: the latest record per key, Kafka compacted-topic
  // semantics ((user, event_type) as the key, offset as the total order —
  // compaction keeps the highest-offset record per key). Executed as the
  // rn = 1 argmax window, which the optimizer rewrites to the bounded-heap
  // TopKPerKey operator: per-key state is ONE row on the map side, so
  // compacting a 100 TB log shuffles only each partition's per-key
  // champions, not the log. Output rolls the retained snapshot up per
  // event_type (count, latest offset, exact value mass in millis) to stay
  // bounded.
  // ===========================================================
  def q93LogCompaction(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("event_id").desc)
    events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_keys"),
        max("event_id").as("latest_offset"),
        sum(expr("CAST(floor(value * 1000) AS BIGINT)")).cast("long").as("value_mass_millis"))
      .orderBy("event_type")
  }

  val q93Sql: String =
    s"""WITH r AS (SELECT event_type, event_id, value,
       |  ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
       | FROM events)
       |SELECT event_type, COUNT(*) AS n_keys, MAX(event_id) AS latest_offset,
       | CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_mass_millis
       |FROM r WHERE rn = 1 GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q95 — burst detection: each topic's peak 5-minute SLIDING-window rate,
  // from minute buckets with an event-time RANGE frame (rangeBetween -240s
  // .. 0s over minute_ts) — the sliding window runs over OBSERVED buckets
  // only (#topics × #minutes rows after the map-side-combined bucket
  // aggregation), never over raw messages, and a RANGE frame handles the
  // gaps a ROWS frame would silently bridge. Output: each topic's peak
  // 5-minute count, when it peaked (earliest peak, deterministic), and
  // the burst ratio vs the mean minute rate in permille.
  // ===========================================================
  def q95BurstDetection(spark: SparkSession, dir: String): DataFrame = {
    val buckets = messages(events(spark, dir))
      .groupBy("topic", "minute_ts")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("topic").orderBy("minute_ts")
      .rangeBetween(-240, 0) // this minute + the 4 preceding event-time minutes
    buckets
      .withColumn("win5", sum("c").over(w))
      .withColumn("peak", max("win5").over(Window.partitionBy("topic")))
      .groupBy("topic")
      .agg(
        sum("c").cast("long").as("n"),
        count(lit(1)).as("n_minutes"),
        max("win5").cast("long").as("peak_5min"),
        min(when(col("win5") === col("peak"), col("minute_ts"))).as("peak_at"))
      .withColumn("burst_permille",
        expr("peak_5min * 1000 DIV (5 * (n DIV n_minutes))"))
      .select("topic", "n", "peak_5min", "peak_at", "burst_permille")
      .orderBy("topic")
  }

  val q95Sql: String =
    s"""WITH msgs AS ($messagesSql),
       | b AS (SELECT topic, minute_ts, COUNT(*) AS c FROM msgs GROUP BY topic, minute_ts),
       | s AS (SELECT topic, minute_ts, c,
       |   SUM(c) OVER (PARTITION BY topic ORDER BY minute_ts
       |     RANGE BETWEEN 240 PRECEDING AND CURRENT ROW) AS win5 FROM b),
       | g AS (SELECT topic, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_minutes,
       |   CAST(MAX(win5) AS BIGINT) AS peak_5min,
       |   MIN(CASE WHEN win5 = (SELECT MAX(win5) FROM s s2 WHERE s2.topic = s.topic)
       |     THEN minute_ts END) AS peak_at
       |  FROM s GROUP BY topic)
       |SELECT topic, n, peak_5min, peak_at,
       | peak_5min * 1000 // (5 * (n // n_minutes)) AS burst_permille
       |FROM g ORDER BY topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q100 — erasure (right-to-be-forgotten) audit: apply a deletion list to
  // the event log and prove the result — per topic, rows erased vs
  // retained, distinct erased subjects, and a LEFT ANTI verification that
  // zero rows for listed subjects survive. At 100 TB this is THE shape of
  // a GDPR pass: the deletion list broadcasts (bounded by legal requests,
  // not data), the retained set is one broadcast anti-join (no shuffle of
  // the log), and the audit trail is aggregation over both sides of the
  // same split — computed in one pass via conditional aggregates on the
  // membership flag, not two scans.
  // ===========================================================
  def q100ErasureAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    // the deletion list: a deterministic stand-in for the legal request set
    val erase = broadcast(
      ev.select(col("user_id")).distinct()
        .filter(pmod(col("user_id"), lit(13)) === 0))
    val stats = ev
      .join(erase.withColumn("listed", lit(1L)), Seq("user_id"), "left_outer")
      .groupBy(col("event_type").as("topic"))
      .agg(
        count(lit(1)).as("n_before"),
        sum(when(col("listed").isNotNull, 1L).otherwise(0L)).as("n_erased"),
        sum(when(col("listed").isNull, 1L).otherwise(0L)).as("n_retained"),
        countDistinct(when(col("listed").isNotNull, col("user_id"))).as("subjects_erased"))
    // The deletion job itself: one broadcast anti-join writes the retained
    // dataset. The audit then probes the MATERIALIZED output re-read from
    // disk — so it verifies what was actually persisted (the write path,
    // serialization, every file), not the join algebra that produced it.
    // An in-plan `anti.join(semi)` would be empty by construction and prove
    // nothing; the round-trip through storage is what makes this an audit.
    // fixed per-process path + overwrite: repeated invocations (Bench runs
    // every query twice) REUSE one directory instead of accumulating a full
    // retained copy of the table per call until the disk fills
    val outPath = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-q100-retained-${spark.sparkContext.applicationId}").getAbsolutePath
    ev.join(erase, Seq("user_id"), "left_anti").write.mode("overwrite").parquet(outPath)
    val retained = spark.read.parquet(outPath)
    val leaked = retained.join(erase, Seq("user_id"), "left_semi")
      .groupBy(col("event_type").as("topic"))
      .agg(count(lit(1)).as("leaked"))
    stats.join(leaked, Seq("topic"), "left_outer")
      .withColumn("leaked", coalesce(col("leaked"), lit(0L)))
      .orderBy("topic")
  }

  val q100Sql: String =
    """WITH erase AS (SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 0),
      | j AS (SELECT e.event_type AS topic, e.user_id, er.user_id AS listed
      |  FROM events e LEFT JOIN erase er ON e.user_id = er.user_id),
      | stats AS (SELECT topic, COUNT(*) AS n_before,
      |   CAST(SUM(CASE WHEN listed IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_erased,
      |   CAST(SUM(CASE WHEN listed IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |   COUNT(DISTINCT CASE WHEN listed IS NOT NULL THEN user_id END) AS subjects_erased
      |  FROM j GROUP BY topic),
      | lk AS (SELECT event_type AS topic, COUNT(*) AS leaked FROM events r
      |  WHERE NOT EXISTS (SELECT 1 FROM erase e1 WHERE e1.user_id = r.user_id)
      |   AND EXISTS (SELECT 1 FROM erase e2 WHERE e2.user_id = r.user_id)
      |  GROUP BY event_type)
      |SELECT stats.topic, n_before, n_erased, n_retained, subjects_erased,
      | CAST(COALESCE(leaked, 0) AS BIGINT) AS leaked
      |FROM stats LEFT JOIN lk ON stats.topic = lk.topic
      |ORDER BY stats.topic""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q101 — sketch-based join cardinality estimation: the query-planning
  // diagnostic behind "should this join broadcast, and how big is its
  // output?". Each side's key set reduces to a KMV sketch (one bounded-
  // state aggregation per side, never a shuffle of the keys); the union
  // estimate comes from merging the sketches (smallest-k-of-distinct-
  // union, the q83 move) and inclusion-exclusion gives the key overlap:
  // |A∩B| ≈ estA + estB − estU. The predicted join output then scales the
  // fact side by the overlap share. Exact figures ride along to expose
  // the estimation error — on these SFs both sets fit inside the sketch,
  // so the estimates are exhaustive-exact; at 100 TB the same plan gives
  // ±2/√k relative error for two aggregations' worth of work.
  // ===========================================================
  def q101JoinCardinality(spark: SparkSession, dir: String): DataFrame = {
    def hashed(df: DataFrame, key: String): DataFrame =
      df.select(col(key).cast("long").as("k"))
        .filter(col("k").isNotNull)
        .withColumn("h",
          graft.plans.TextKernels.md5_prefix60(col("k").cast("string").cast("binary")))
    val ev = events(spark, dir)
    // scan 1: every fact-side figure (sketch state, exact distinct, row
    // count) from ONE aggregation
    val a = hashed(ev, "user_id")
      .agg(countDistinct("k").as("na_exact"),
        graft.functions.KmvSketch.kmv_estimate(col("h")).as("na_est"),
        graft.functions.SmallestK.smallest_k(col("h"), KmvK).as("ska"),
        count(lit(1)).as("n_fact"))
    val b = hashed(spark.read.parquet(s"$dir/customer.parquet"), "c_custkey")
      .agg(countDistinct("k").as("nb_exact"),
        graft.functions.KmvSketch.kmv_estimate(col("h")).as("nb_est"),
        graft.functions.SmallestK.smallest_k(col("h"), KmvK).as("skb"))
    // scan 2: the ground-truth join, yielding BOTH exact figures at once
    val exact = ev.filter(col("user_id").isNotNull)
      .join(broadcast(spark.read.parquet(s"$dir/customer.parquet").select(
        col("c_custkey").as("user_id"))), Seq("user_id"))
      .agg(count(lit(1)).as("join_rows_exact"),
        countDistinct("user_id").as("inter_exact"))
    a.crossJoin(b).crossJoin(exact)
      .withColumn("merged", expr(s"slice(array_sort(array_distinct(concat(ska, skb))), 1, $KmvK)"))
      .withColumn("union_est",
        when(size(col("merged")) < KmvK, size(col("merged")).cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * lit(1152921504606846976.0) /
            element_at(col("merged"), KmvK).cast("double")))
      .withColumn("inter_est", greatest(lit(0.0),
        col("na_est") + col("nb_est") - col("union_est")))
      .withColumn("join_rows_est",
        col("n_fact").cast("double") * col("inter_est") / col("na_est"))
      .select("na_exact", "na_est", "nb_exact", "nb_est", "union_est",
        "inter_est", "inter_exact", "join_rows_est", "join_rows_exact")
  }

  val q101Sql: String = {
    def side(table: String, key: String, tag: String) =
      s""" ${tag}h AS (SELECT DISTINCT CAST($key AS BIGINT) AS k,
         |   CAST(('0x' || substr(md5(CAST(CAST($key AS BIGINT) AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM $table WHERE $key IS NOT NULL),
         | ${tag}r AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM ${tag}h),
         | ${tag}e AS (SELECT COUNT(*) AS exact,
         |   CASE WHEN (SELECT COUNT(*) FROM ${tag}h) < $KmvK
         |        THEN CAST((SELECT COUNT(*) FROM ${tag}h) AS DOUBLE)
         |        ELSE CAST(${KmvK - 1} AS DOUBLE) * 1152921504606846976.0 /
         |          CAST((SELECT h FROM ${tag}r WHERE rn = $KmvK) AS DOUBLE) END AS est,
         |   list(h ORDER BY h)[:$KmvK] AS sk
         |  FROM ${tag}h)""".stripMargin
    s"""WITH ${side("events", "user_id", "a")},
       |${side("customer", "c_custkey", "b")},
       | inter AS (SELECT COUNT(*) AS inter_exact FROM
       |  (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL) e
       |  WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = e.user_id)),
       | jr AS (SELECT COUNT(*) AS join_rows_exact FROM events e JOIN customer c
       |  ON e.user_id = c.c_custkey WHERE e.user_id IS NOT NULL),
       | nf AS (SELECT COUNT(*) AS n_fact FROM events WHERE user_id IS NOT NULL),
       | m AS (SELECT ae.exact AS na_exact, ae.est AS na_est,
       |   be.exact AS nb_exact, be.est AS nb_est,
       |   list_sort(list_distinct(ae.sk || be.sk))[:$KmvK] AS merged
       |  FROM ae, be),
       | u AS (SELECT *, CASE WHEN len(merged) < $KmvK THEN CAST(len(merged) AS DOUBLE)
       |   ELSE CAST(${KmvK - 1} AS DOUBLE) * 1152921504606846976.0 / CAST(merged[$KmvK] AS DOUBLE)
       |   END AS union_est FROM m),
       | x AS (SELECT *, greatest(0.0, na_est + nb_est - union_est) AS inter_est FROM u)
       |SELECT na_exact, na_est, nb_exact, nb_est, union_est, inter_est, inter_exact,
       | CAST(n_fact AS DOUBLE) * inter_est / na_est AS join_rows_est, join_rows_exact
       |FROM x, inter, jr, nf""".stripMargin.replace("\n", " ")
  }

  // ===========================================================
  // q105 — availability probe evaluation (job.proto:353-356
  // AVAILABILITY_JOB_TYPE_NATIVE_CONSUMER; AuditType AUDIT_TYPE_AVAILABILITY
  // job.proto:324-325): the events table viewed as the probe topic a
  // NATIVE_PRODUCER writes — per (topic, minute): delivery count and
  // produce→observe latency percentiles against a fixed observation
  // instant. This is the batch form of streaming/QueueJobs.probeStats (the
  // SAME operator the AVAILABILITY job runs), so the oracle gates the job
  // type's arithmetic. One projection + one hash aggregation; percentile
  // runs map-side-partial like q11's.
  // ===========================================================
  /** Fixed observation instant: 2024-02-01T00:00:00Z, after every event at
    * any SF — latencies stay positive and deterministic. */
  val ProbeNowMs = 1706745600000L

  def q105ProbeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = events(spark, dir).select(
      lit(null).cast("binary").as("key"),
      lit(null).cast("binary").as("value"),
      col("event_type").as("topic"),
      pmod(col("user_id"), lit(8)).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").cast("long").as("timestampNs"),
      typedLit(Map.empty[String, Array[Byte]]).as("headers"))
      .as[graft.streaming.ForwardingEngine.KafkaRecord]
    graft.streaming.QueueJobs.probeStats(recs, ProbeNowMs)
  }

  val q105Sql: String =
    s"""WITH probes AS (SELECT event_type AS topic,
       |  epoch_ns(ts) // 60000000000 AS minute_ts,
       |  $ProbeNowMs - epoch_ns(ts) // 1000000 AS latency_ms FROM events)
       |SELECT topic, minute_ts, COUNT(*) AS n_probes,
       | CAST(floor(quantile_cont(latency_ms, 0.5)) AS BIGINT) AS p50_ms,
       | CAST(floor(quantile_cont(latency_ms, 0.99)) AS BIGINT) AS p99_ms,
       | MAX(latency_ms) AS max_ms
       |FROM probes GROUP BY topic, minute_ts
       |ORDER BY topic, minute_ts""".stripMargin.replace("\n", " ")

  // ---- registry ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_probe_stats" -> (q105ProbeStats _),
    "q101_join_cardinality" -> (q101JoinCardinality _),
    "q100_erasure_audit" -> (q100ErasureAudit _),
    "q95_burst_detection" -> (q95BurstDetection _),
    "q93_log_compaction" -> (q93LogCompaction _),
    "q89_gap_detection" -> (q89GapDetection _),
    "q90_drift_stat" -> (q90DriftStat _),
    "q79_zorder_layout" -> (q79ZorderLayout _),
    "q80_load_gini" -> (q80LoadGini _),
    "q83_agg_state_merge" -> (q83AggStateMerge _),
    "q85_histogram_quantiles" -> (q85HistogramQuantiles _),
    "q01_code_distribution" -> (q01CodeDistribution _),
    "q02_route_destinations" -> (q02RouteDestinations _),
    "q03_backoff_escalation" -> (q03BackoffEscalation _),
    "q04_throughput_window" -> (q04ThroughputWindow _),
    "q05_commit_watermark" -> (q05CommitWatermark _),
    "q06_latency_histogram" -> (q06LatencyHistogram _),
    "q07_checkpoint_info" -> (q07CheckpointInfo _),
    "q08_flow_control_quota" -> (q08FlowControlQuota _),
    "q09_reconcile_commands" -> (q09ReconcileCommands _),
    "q10_partition_diff" -> (q10PartitionDiff _),
    "q11_scale_percentiles" -> (q11ScalePercentiles _),
    "q12_audit_exact_uniq" -> (q12AuditExactUniq _),
    "q13_bounded_dlq_merge" -> (q13BoundedDlqMerge _),
    "q14_tier_select" -> (q14TierSelect _),
    "q15_audit_approx_uniq" -> (q15AuditApproxUniq _),
    "q18_salted_hotkey_agg" -> (q18SaltedHotKeyAgg _),
    "q64_hot_keys" -> (q64HotKeys _),
    "q70_throughput_trend" -> (q70ThroughputTrend _))

  val oracles: Map[String, String] = Map(
    "q105_probe_stats" -> q105Sql,
    "q101_join_cardinality" -> q101Sql,
    "q100_erasure_audit" -> q100Sql,
    "q95_burst_detection" -> q95Sql,
    "q93_log_compaction" -> q93Sql,
    "q89_gap_detection" -> q89Sql,
    "q90_drift_stat" -> q90Sql,
    "q79_zorder_layout" -> q79Sql,
    "q80_load_gini" -> q80Sql,
    "q83_agg_state_merge" -> q83Sql,
    "q85_histogram_quantiles" -> q85Sql,
    "q01_code_distribution" -> q01Sql,
    "q02_route_destinations" -> q02Sql,
    "q03_backoff_escalation" -> q03Sql,
    "q04_throughput_window" -> q04Sql,
    "q05_commit_watermark" -> q05Sql,
    "q06_latency_histogram" -> q06Sql,
    "q07_checkpoint_info" -> q07Sql,
    "q08_flow_control_quota" -> q08Sql,
    "q09_reconcile_commands" -> q09Sql,
    "q10_partition_diff" -> q10Sql,
    "q11_scale_percentiles" -> q11Sql,
    "q12_audit_exact_uniq" -> q12Sql,
    "q13_bounded_dlq_merge" -> q13Sql,
    "q14_tier_select" -> q14Sql,
    "q15_audit_approx_uniq" -> q15Sql,
    "q18_salted_hotkey_agg" -> q18Sql,
    "q64_hot_keys" -> q64Sql,
    "q70_throughput_trend" -> q70Sql)
}
