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
}
