package graft

import graft.streaming.AckStateOp
import graft.streaming.AckStateOp.AckEvent
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AckStateOpSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("watermark advances across micro-batches through the state store") {
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AckEvent](
      implicitly[org.apache.spark.sql.Encoder[AckEvent]], spark.sqlContext)
    val q = AckStateOp.updates(input.toDS(), capacity = 100)
      .writeStream.outputMode("append").format("memory").queryName("wm").start()

    // batch 1: receive 0..4, ack offsets 2 and 3 (out of order, head unacked)
    input.addData(
      (0L until 5L).map(o => AckEvent("t", 0, o, "receive")) ++
        Seq(AckEvent("t", 0, 4L, "ack"), AckEvent("t", 0, 3L, "ack")))
    q.processAllAvailable()
    assert(spark.sql("SELECT count(*) FROM wm").head().getLong(0) == 0) // nothing contiguous

    // batch 2: ack the head -> watermark jumps over the acked run
    input.addData(Seq(AckEvent("t", 0, 1L, "ack"), AckEvent("t", 0, 2L, "ack")))
    q.processAllAvailable()
    val wms = spark.sql("SELECT commitOffset FROM wm ORDER BY commitOffset").collect().map(_.getLong(0))
    assert(wms.nonEmpty && wms.last == 4L) // offsets 0..3 acked -> commit 4

    // batch 3: final ack commits everything; a second partition is independent
    input.addData(Seq(
      AckEvent("t", 0, 5L, "ack"),
      AckEvent("t", 1, 10L, "receive"), AckEvent("t", 1, 11L, "ack")))
    q.processAllAvailable()
    q.stop()
    val all = spark.sql("SELECT partition, max(commitOffset) FROM wm GROUP BY partition ORDER BY partition")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(all.toSeq == Seq((0, 5L), (1, 11L)))
  }

  test("capacity overflow defers receives instead of losing them") {
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AckEvent](
      implicitly[org.apache.spark.sql.Encoder[AckEvent]], spark.sqlContext)
    val q = AckStateOp.updates(input.toDS(), capacity = 3)
      .writeStream.outputMode("append").format("memory").queryName("wm_cap").start()
    try {
      // 4 receives against capacity 3: the 4th must defer, and its ack
      // (offset 4 = message 3) must defer WITH it, not be silently ignored
      input.addData(
        (0L to 3L).map(o => AckEvent("t", 0, o, "receive")) ++
          (1L to 4L).map(o => AckEvent("t", 0, o, "ack")))
      q.processAllAvailable()
      val after1 = spark.sql("SELECT max(commitOffset) FROM wm_cap").head()
      assert(!after1.isNullAt(0) && after1.getLong(0) == 3L) // messages 0-2 committed

      // next trigger: freed capacity lets the deferred pair replay before
      // the new traffic — commit must pass THROUGH 4 (message 3 acked),
      // which a lossy implementation would skip straight past
      input.addData(Seq(AckEvent("t", 0, 4L, "receive"), AckEvent("t", 0, 5L, "ack")))
      q.processAllAvailable()
      val commits = spark.sql("SELECT commitOffset FROM wm_cap ORDER BY commitOffset")
        .collect().map(_.getLong(0)).toSeq
      assert(commits.contains(4L), s"deferred ack was lost: $commits")
      assert(commits.last == 5L)
    } finally q.stop()
  }

  test("engine outcomes bridged through the state op reproduce the engine's watermark") {
    import graft.streaming.ForwardingEngine
    import graft.streaming.ForwardingEngine.KafkaRecord
    // 40 messages across 2 partitions through the real engine
    val recs = (0 until 40).map { i =>
      KafkaRecord(s"k$i".getBytes, s"m$i".getBytes, "events", i % 2, (i / 2).toLong, 0L, Map.empty)
    }
    val outcomes = ForwardingEngine.processBatch(
      graft.operators.PipelineOps.pipelineSpec("events"),
      graft.operators.PipelineOps.DeterministicDispatcherFactory,
      "local", spark.createDataset(recs))
    val engineWm = outcomes.collect()
      .groupBy(_.physicalPartition).view.mapValues(_.map(_.commitWatermark).max).toMap

    // replay the same outcomes through the cross-batch path
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AckEvent](
      implicitly[org.apache.spark.sql.Encoder[AckEvent]], spark.sqlContext)
    val q = AckStateOp.updates(input.toDS(), capacity = 100)
      .writeStream.outputMode("append").format("memory").queryName("wm_bridge").start()
    input.addData(AckStateOp.fromOutcomes(outcomes).collect().toSeq)
    q.processAllAvailable()
    q.stop()
    val opWm = spark.sql(
        "SELECT partition, max(commitOffset) FROM wm_bridge GROUP BY partition")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // the deterministic dispatcher resolves every message (terminal or
    // routed), so both paths must commit the full range on both partitions
    assert(opWm == engineWm)
    assert(opWm.values.toSet == Set(20L))
  }
}
