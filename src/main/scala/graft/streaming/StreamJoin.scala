package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream event-time interval join.
  *
  * The forwarding engine's end-to-end latency view (reference
  * `ProcessorImpl.java:120-186` buckets commit-time minus fetch-time) needs
  * the fetch stream joined against the ack/outcome stream per message. In
  * batch that is q05/q50's equi-join; live, an unbounded stream-stream join
  * would buffer both sides forever. The interval join is the bounded form:
  * a match must land within a horizon of the left event, so Spark's state
  * cleanup (driven by BOTH watermarks plus the time-bound condition) evicts
  * buffered rows as soon as no future match is possible.
  *
  * Scale design: state per side ≈ arrival rate × (watermark delay +
  * horizon), independent of stream length; the join itself shuffles both
  * sides by key exactly once — same as a batch shuffle join.
  */
object StreamJoin {

  /** Inner interval join: rows match when their `keys` are equal and
    * `rightTs` ∈ [`leftTs`, `leftTs` + `horizon`]. Both sides get event-time
    * watermarks (`leftDelay`/`rightDelay` lateness budgets). Columns from
    * both sides survive; name-collide columns (the keys, timestamps) should
    * be pre-aliased distinctly on each side except the join keys.
    *
    * On batch frames the same call degrades to a plain join with the
    * interval predicate — identical semantics for a backfill.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      leftDelay: String, rightDelay: String, horizon: String): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTs, leftDelay) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, rightDelay) else right
    val keyCond = keys.map(k => s"l.$k = r.$k").mkString(" AND ")
    val cond = expr(
      s"$keyCond AND r.$rightTs >= l.$leftTs AND r.$rightTs <= l.$leftTs + interval $horizon")
    val joined = l.as("l").join(r.as("r"), cond, "inner")
    // project the keys once (qualified duplicates otherwise)
    keys.foldLeft(joined)((df, k) => df.drop(org.apache.spark.sql.functions.col(s"r.$k")))
  }
}
