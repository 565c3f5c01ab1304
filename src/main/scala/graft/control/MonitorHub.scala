package graft.control

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

/**
 * Bounded snapshot store wiring the live data-quality monitors
 * (streaming/DriftStream, streaming/HotKeyStream, streaming/AuditStream)
 * into the management surface — the same move that put the autoscaler
 * behind `/status/scaler`: an operator scripts against JSON, not against
 * a Spark query handle.
 *
 * Each monitor's streaming query attaches `hub.sink(kind)` as its
 * foreachBatch; every emitted (window, topic) row lands as one JSON
 * object keyed by (kind, topic, windowStart). Complete-mode re-emissions
 * of a still-open window overwrite their key (latest wins) and the TTL
 * ages closed windows out, so the store is bounded by
 * kinds × topics × windows-inside-TTL — never by traffic volume. The
 * per-trigger `collect()` is the monitor OUTPUT (already reduced to that
 * same bound), not the stream.
 */
final class MonitorHub(
    ttlMs: Long = 3600000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val store = new TtlRegistry[(String, String, Long), String](ttlMs, clock)

  /** foreachBatch sink for a monitor output frame. Requires columns
    * `window_start: timestamp` and `keyCol: string` (default `topic` —
    * TokenizerStream keys by `source`); every column (including those
    * two) is serialized generically into the stored JSON object. */
  def sink(kind: String, keyCol: String = "topic")(batch: DataFrame, batchId: Long): Unit =
    batch.collect().foreach { row =>
      val fields = row.schema.fields.indices.map { i =>
        s""""${StatusServer.escJson(row.schema.fields(i).name)}":${jsonValue(row.get(i))}"""
      }
      store.put(
        (kind, row.getAs[String](keyCol), row.getAs[Timestamp]("window_start").getTime),
        fields.mkString("{", ",", "}"))
    }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case t: Timestamp => t.getTime.toString
    case s: String => s""""${StatusServer.escJson(s)}""""
    case b: Boolean => b.toString
    case xs: scala.collection.Seq[_] => xs.map(jsonValue).mkString("[", ",", "]")
    case n => n.toString // numeric types serialize verbatim
  }

  def kinds: Seq[String] = store.live.keys.map(_._1).toSeq.distinct.sorted

  // per-monitor state-size providers, registered via trackState
  private val stateOf =
    new java.util.concurrent.ConcurrentHashMap[String, () => Long]()

  /** Register a monitor's live StreamingQuery so /status/monitors reports
    * its total state rows (StreamingQueryProgress.stateOperators
    * .numRowsTotal summed; -1 until the first progress lands). At 100×
    * scale this is the signal the operator watches for unbounded state
    * growth — the same figure StateSoakSpec bounds in CI, now live per
    * monitor rather than only inline in NoveltyStream's fill_permille. */
  def trackState(kind: String,
      query: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    stateOf.put(kind, () =>
      Option(query.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L))

  /** {"drift":42,"hotkeys":7} over the tracked monitors (kind-sorted). */
  def stateJson: String = {
    import scala.jdk.CollectionConverters._
    stateOf.asScala.toSeq.sortBy(_._1)
      .map { case (k, f) =>
        val n = try f() catch { case _: Throwable => -1L }
        s""""${StatusServer.escJson(k)}":$n"""
      }
      .mkString("{", ",", "}")
  }

  /** JSON array of one kind's live windows, (topic, window) ordered. */
  def json(kind: String): String =
    store.live.toSeq
      .collect { case ((k, topic, ws), doc) if k == kind => (topic, ws, doc) }
      .sortBy { case (topic, ws, _) => (topic, ws) }
      .map(_._3)
      .mkString("[", ",", "]")

  /** All kinds plus per-monitor state telemetry:
    * {"drift":[...],"hotkeys":[...],"state_rows":{"drift":42}}
    * ("state_rows" is reserved — don't name a monitor kind that). */
  def allJson: String =
    (kinds.map(k => s""""${StatusServer.escJson(k)}":${json(k)}""") :+
      s""""state_rows":$stateJson""").mkString("{", ",", "}")
}
