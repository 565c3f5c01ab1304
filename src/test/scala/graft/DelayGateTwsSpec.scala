package graft

import graft.streaming.DelayGateTws
import graft.streaming.DelayGateTws.{DelayedRecord, Released}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The delayed-visibility gate must hold records for exactly delayMs of
  * EVENT time (watermark-driven, deterministic) and release them in offset
  * order per due instant — the live form of the reference's
  * KafkaDelayProcessManager pause/resume (see DelayGateTws scaladoc). */
class DelayGateTwsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Drive batches through the gate; returns (released rows, per-batch
    * release counts) so tests can assert WHEN a record became visible. */
  private def run(
      delayMs: Long,
      batches: Seq[Seq[DelayedRecord]],
      name: String): (Seq[Released], Seq[Int]) = {
    val input = MemoryStream[DelayedRecord](
      implicitly[org.apache.spark.sql.Encoder[DelayedRecord]], spark.sqlContext)
    val q = DelayGateTws.gate(input.toDS(), delayMs)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      val counts = batches.map { b =>
        input.addData(b)
        q.processAllAvailable()
        spark.table(name).count().toInt
      }
      val rows = spark.sql(s"SELECT * FROM $name ORDER BY dueMs, topic, partition, offset")
        .as[Released].collect().toSeq
      (rows, counts.zip(0 +: counts.dropRight(1)).map { case (c, p) => c - p })
    } finally q.stop()
  }

  private val T0 = 1700000000000L // fixed epoch base, deterministic

  test("records stay invisible for delayMs of event time, then release") {
    val batches = Seq(
      // batch 1: two records at T0; watermark after the batch = T0, due =
      // T0+10s -> both buffered, nothing out
      Seq(DelayedRecord("t", 0, 1L, T0), DelayedRecord("t", 0, 2L, T0)),
      // batch 2: a record at T0+5s advances the watermark to T0+5s — still
      // before due; it gets buffered too (due T0+15s)
      Seq(DelayedRecord("t", 0, 3L, T0 + 5000)),
      // batch 3: a record at T0+20s pushes the watermark past BOTH dues;
      // the two timers fire and release 1,2 (due T0+10s) then 3 (T0+15s);
      // the new record itself (due T0+30s) stays
      Seq(DelayedRecord("t", 0, 4L, T0 + 20000)))
    val (rows, perBatch) = run(10000L, batches, "gate_basic")
    assert(perBatch == Seq(0, 0, 3))
    assert(rows.map(r => (r.offset, r.dueMs)) ==
      Seq((1L, T0 + 10000), (2L, T0 + 10000), (3L, T0 + 15000)))
  }

  test("late records are dropped by the event-time filter, never resurrected") {
    // a record whose event time is behind the watermark is filtered before
    // the operator — the correct contract for the retry path, where every
    // retry is re-produced with a fresh timestamp (see scaladoc)
    val batches = Seq(
      Seq(DelayedRecord("t", 0, 1L, T0 + 60000)), // wm -> T0+60s
      Seq(DelayedRecord("t", 0, 2L, T0)),         // late: dropped
      Seq(DelayedRecord("t", 0, 3L, T0 + 600000))) // flush all timers
    val (rows, _) = run(10000L, batches, "gate_late")
    assert(rows.map(_.offset).toSet == Set(1L))
  }

  test("delayMs = 0 (disabled gate) passes records through") {
    val batches = Seq(
      Seq(DelayedRecord("t", 0, 1L, T0)),              // wm -> T0
      Seq(DelayedRecord("t", 0, 2L, T0 + 1)),          // just above wm: admitted
      Seq(DelayedRecord("t", 0, 3L, T0 + 600000)))     // wm -> far future
    // with delay 0 every record's due time equals its event time, so each
    // releases as soon as the watermark reaches it (same trigger or the
    // next, depending on the operator-visible watermark's one-trigger lag);
    // nothing is held longer and nothing is lost
    val (rows, _) = run(0L, batches, "gate_disabled")
    assert(rows.map(_.offset).toSet == Set(1L, 2L, 3L))
  }

  test("per-partition isolation: one partition's watermark work releases only due buckets") {
    val batches = Seq(
      Seq(DelayedRecord("t", 0, 1L, T0), DelayedRecord("t", 1, 9L, T0 + 30000)),
      Seq(DelayedRecord("t", 0, 2L, T0 + 40000)))
    val (rows, _) = run(5000L, batches, "gate_parts")
    // after batch 2 the watermark is T0+40s: offset 1 (due T0+5s) and
    // offset 9 (due T0+35s) both released; offsets 2 (due T0+45s) held
    assert(rows.map(_.offset).toSet == Set(1L, 9L))
  }

  test("buffered records and their timers survive a checkpoint restart") {
    val input = MemoryStream[DelayedRecord](
      implicitly[org.apache.spark.sql.Encoder[DelayedRecord]], spark.sqlContext)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gate-ckpt").toString
    val released = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long)]()
    // foreachBatch sink: the memory sink refuses checkpoint recovery
    def start() =
      DelayGateTws.gate(input.toDS(), 10000L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Released], _: Long) =>
          batch.collect().foreach(r => released.add((r.offset, r.dueMs))); ()
        }.start()

    // run 1: two records buffer (due T0+10s, watermark only reaches T0)
    val q1 = start()
    input.addData(Seq(DelayedRecord("t", 0, 1L, T0), DelayedRecord("t", 0, 2L, T0)))
    q1.processAllAvailable()
    assert(released.isEmpty)
    q1.stop() // "crash" with state in the store

    // traffic that arrives while the query is down pushes the watermark
    // far past the buffered dues
    input.addData(Seq(DelayedRecord("t", 0, 3L, T0 + 120000)))

    val q2 = start()
    try {
      q2.processAllAvailable()
      // the recovered state + timers release the pre-crash records exactly
      val out = scala.jdk.CollectionConverters.SetHasAsScala(released).asScala.toSet
      assert(out.map(_._1) == Set(1L, 2L))
      assert(out.forall(_._2 == T0 + 10000))
    } finally q2.stop()
  }

  test("many records sharing a due instant release together, offset-ordered") {
    val batches = Seq(
      (0 until 20).map(i => DelayedRecord("t", 0, 19L - i, T0)),
      Seq(DelayedRecord("t", 0, 100L, T0 + 3600000)))
    val (rows, perBatch) = run(1000L, batches, "gate_bucket")
    assert(perBatch == Seq(0, 20))
    assert(rows.map(_.offset) == (0L until 20L))
  }
}
