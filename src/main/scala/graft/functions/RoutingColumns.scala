package graft.functions

import graft.model._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The routing decision tree as *both* a Catalyst column expression and the
 * equivalent ANSI SQL text, generated from the same model functions so the
 * engine and the DuckDB correctness oracle cannot drift.
 *
 * Everything here is a pure `when/otherwise` chain — fully codegen'd by
 * whole-stage codegen, no UDFs in the hot path, and safe to evaluate on
 * billions of rows (no state, no shuffle).
 */
object RoutingColumns {

  // ---- gRPC status -> dispatch code (DispatcherImpl.java:70-131 contract) ----

  /** Column expr: dispatch code name from (status, overdue, action). */
  def codeColumn(status: Column, overdue: Column, action: Column): Column = {
    // enumerate the full decision table from the model function itself:
    // actions first (they override), then statuses.
    val actionChain = Seq(KafkaAction.Retry, KafkaAction.Stash, KafkaAction.Skip)
      .foldLeft(None: Option[Column]) { (acc, a) =>
        val mapped = lit(Responses.codeFor("OK", isOverdue = false, Some(a)).name)
        Some(acc.fold(when(action === a, mapped))(_.when(action === a, mapped)))
      }.get
    val statusChain = GrpcStatus.all.foldLeft(actionChain) { (acc, st) =>
      val noOver = Responses.codeFor(st, isOverdue = false, None).name
      val over = Responses.codeFor(st, isOverdue = true, None).name
      if (noOver == over) acc.when(status === st, lit(noOver))
      else acc.when(status === st && overdue, lit(over))
        .when(status === st, lit(noOver))
    }
    statusChain.otherwise(lit(DispatchCode.Invalid.name))
  }

  /** Same decision table as DuckDB-compatible SQL (CASE chain). */
  def codeSql(status: String, overdue: String, action: String): String = {
    val actions = Seq(KafkaAction.Retry, KafkaAction.Stash, KafkaAction.Skip)
      .map(a => s"WHEN $action = '$a' THEN '${Responses.codeFor("OK", false, Some(a)).name}'")
    val statuses = GrpcStatus.all.map { st =>
      val noOver = Responses.codeFor(st, false, None).name
      val over = Responses.codeFor(st, true, None).name
      if (noOver == over) s"WHEN $status = '$st' THEN '$noOver'"
      else s"WHEN $status = '$st' AND $overdue THEN '$over' WHEN $status = '$st' THEN '$noOver'"
    }
    (actions ++ statuses).mkString("CASE ", " ", s" ELSE '${DispatchCode.Invalid.name}' END")
  }

  // ---- tiered retry destination (RetryUtils.java:23-58 contract) ----

  /** Column expr: destination retry topic for a retry count under `spec`. */
  def retryDestinationColumn(spec: JobSpec, retryCount: Column): Column = {
    if (!spec.hasTieredRetry) return lit(spec.rpc.dlqTopic)
    val tiers = spec.sortedTiers
    var ceiling = 0L
    val chain = tiers.foldLeft(None: Option[Column]) { (acc, t) =>
      ceiling += t.maxRetryCount
      val cond = retryCount <= ceiling
      Some(acc.fold(when(cond, lit(t.topic)))(_.when(cond, lit(t.topic))))
    }.get
    val overflow = if (spec.rpc.dlqTopic.isEmpty) tiers.last.topic else spec.rpc.dlqTopic
    chain.otherwise(lit(overflow))
  }

  /** Same tier walk as SQL. */
  def retryDestinationSql(spec: JobSpec, retryCount: String): String = {
    if (!spec.hasTieredRetry) return s"'${spec.rpc.dlqTopic}'"
    val tiers = spec.sortedTiers
    var ceiling = 0L
    val whens = tiers.map { t =>
      ceiling += t.maxRetryCount
      s"WHEN $retryCount <= $ceiling THEN '${t.topic}'"
    }
    val overflow = if (spec.rpc.dlqTopic.isEmpty) tiers.last.topic else spec.rpc.dlqTopic
    whens.mkString("CASE ", " ", s" ELSE '$overflow' END")
  }

  // ---- timeout escalation (ProcessorImpl.java:417-465 contract) ----

  /** Column expr: escalated code for a BACKOFF outcome. Non-BACKOFF codes
    * pass through unchanged. */
  def escalateBackoffColumn(
      spec: JobSpec,
      code: Column,
      sourceTopic: Column,
      timeoutCount: Column,
      dlqTokenAvailable: Column): Column = {
    val max = spec.rpc.maxRpcTimeouts
    val escalated =
      when(sourceTopic === spec.rpc.dlqTopic, lit(DispatchCode.Dlq.name))
        .when(sourceTopic === spec.resqTopic && lit(spec.resqTopic.nonEmpty),
          lit(DispatchCode.Invalid.name))
        .otherwise(
          if (max > 0)
            when(timeoutCount >= max && dlqTokenAvailable, lit(DispatchCode.Dlq.name))
              .otherwise(lit(DispatchCode.Retry.name))
          else lit(DispatchCode.Retry.name))
    when(code === DispatchCode.Backoff.name, escalated).otherwise(code)
  }

  /** Same escalation as SQL. */
  def escalateBackoffSql(
      spec: JobSpec,
      code: String,
      sourceTopic: String,
      timeoutCount: String,
      dlqTokenAvailable: String): String = {
    val max = spec.rpc.maxRpcTimeouts
    val inner = new StringBuilder("CASE ")
    inner.append(s"WHEN $sourceTopic = '${spec.rpc.dlqTopic}' THEN '${DispatchCode.Dlq.name}' ")
    if (spec.resqTopic.nonEmpty)
      inner.append(s"WHEN $sourceTopic = '${spec.resqTopic}' THEN '${DispatchCode.Invalid.name}' ")
    if (max > 0)
      inner.append(s"WHEN $timeoutCount >= $max AND $dlqTokenAvailable THEN '${DispatchCode.Dlq.name}' ")
    inner.append(s"ELSE '${DispatchCode.Retry.name}' END")
    s"CASE WHEN $code = '${DispatchCode.Backoff.name}' THEN (${inner.toString}) ELSE $code END"
  }

  // ---- final destination routing (ProcessorImpl.java:367-394 contract) ----

  /** Column expr: destination topic or 'ack:<code>' marker for non-produced
    * outcomes (COMMIT/SKIP ack; DROPPED ack; INVALID in-memory retry). */
  def destinationColumn(spec: JobSpec, code: Column, retryCount: Column): Column = {
    val dlqFallback =
      if (spec.rpc.dlqTopic.nonEmpty) spec.rpc.dlqTopic
      else if (spec.hasTieredRetry) spec.sortedTiers.last.topic
      else ""
    // mirror Routing.destinationTopic: an unconfigured topic means ACK, not
    // an empty-string "topic" no producer could write to
    val ackMarker = concat(lit("ack:"), code)
    val retryBranch =
      if (spec.hasTieredRetry || dlqFallback.nonEmpty) retryDestinationColumn(spec, retryCount)
      else ackMarker
    val dlqBranch = if (dlqFallback.nonEmpty) lit(dlqFallback) else ackMarker
    val resqBranch = if (spec.resqTopic.nonEmpty) lit(spec.resqTopic) else ackMarker
    when(code === DispatchCode.Retry.name, retryBranch)
      .when(code === DispatchCode.Dlq.name, dlqBranch)
      .when(code === DispatchCode.Resq.name, resqBranch)
      .otherwise(ackMarker)
  }

  /** Same routing as SQL. */
  def destinationSql(spec: JobSpec, code: String, retryCount: String): String = {
    val dlqFallback =
      if (spec.rpc.dlqTopic.nonEmpty) spec.rpc.dlqTopic
      else if (spec.hasTieredRetry) spec.sortedTiers.last.topic
      else ""
    val ackSql = s"'ack:' || $code"
    val retrySql =
      if (spec.hasTieredRetry || dlqFallback.nonEmpty) s"(${retryDestinationSql(spec, retryCount)})"
      else ackSql
    val dlqSql = if (dlqFallback.nonEmpty) s"'$dlqFallback'" else ackSql
    val resqSql = if (spec.resqTopic.nonEmpty) s"'${spec.resqTopic}'" else ackSql
    s"""CASE WHEN $code = '${DispatchCode.Retry.name}' THEN $retrySql
       | WHEN $code = '${DispatchCode.Dlq.name}' THEN $dlqSql
       | WHEN $code = '${DispatchCode.Resq.name}' THEN $resqSql
       | ELSE 'ack:' || $code END""".stripMargin.replace("\n", " ")
  }

  // ---- latency histogram buckets (ProcessorImpl.java:120-186 shape) ----

  /** E2E latency bucket boundaries in ms (subset of the reference's
    * 10ms..32h explicit buckets; upper bound label "inf"). */
  val LatencyBucketsMs: Seq[Long] =
    Seq(10L, 50L, 100L, 500L, 1000L, 5000L, 30000L, 60000L, 300000L,
      1800000L, 3600000L, 21600000L, 86400000L, 115200000L)

  def latencyBucketColumn(latencyMs: Column): Column = {
    val chain = LatencyBucketsMs.zipWithIndex.foldLeft(None: Option[Column]) {
      case (acc, (b, i)) =>
        val label = lit(f"$i%02d_le_$b")
        Some(acc.fold(when(latencyMs <= b, label))(_.when(latencyMs <= b, label)))
    }.get
    chain.otherwise(lit(f"${LatencyBucketsMs.size}%02d_inf"))
  }

  def latencyBucketSql(latencyMs: String): String = {
    val whens = LatencyBucketsMs.zipWithIndex.map { case (b, i) =>
      s"WHEN $latencyMs <= $b THEN '${f"$i%02d_le_$b"}'"
    }
    whens.mkString("CASE ", " ", s" ELSE '${f"${LatencyBucketsMs.size}%02d_inf"}' END")
  }

  // ---- gRPC status derivation used by the demo queries ----

  /** Deterministic status name from a numeric id: statuses.all(id % 17).
    * Used to turn the `events` table into a message-outcome stream that both
    * Spark and the oracle derive identically. */
  def statusFromIdColumn(id: Column): Column = {
    val n = GrpcStatus.all.size
    GrpcStatus.all.zipWithIndex.foldLeft(None: Option[Column]) {
      case (acc, (st, i)) =>
        // % (Java remainder), NOT pmod: the oracle's SQL uses native %,
        // and the two disagree for negative ids — both must fall through
        // to the same branch
        val cond = (id % lit(n)) === i
        Some(acc.fold(when(cond, lit(st)))(_.when(cond, lit(st))))
    }.get.otherwise(lit(GrpcStatus.UNKNOWN))
  }

  def statusFromIdSql(id: String): String = {
    val n = GrpcStatus.all.size
    val whens = GrpcStatus.all.zipWithIndex.map { case (st, i) =>
      s"WHEN ($id % $n) = $i THEN '$st'"
    }
    whens.mkString("CASE ", " ", s" ELSE '${GrpcStatus.UNKNOWN}' END")
  }
}
