package graft

import graft.streaming.{AckStateOp, AckStateTws}
import graft.streaming.AckStateOp.AckEvent
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** AckStateTws must be event-for-event equivalent to AckStateOp: same
  * watermark updates on the same stream, across triggers, under capacity
  * backpressure. transformWithState requires the RocksDB state store. */
class AckStateTwsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def runThrough(
      op: org.apache.spark.sql.Dataset[AckEvent] => org.apache.spark.sql.Dataset[AckStateOp.WatermarkUpdate],
      batches: Seq[Seq[AckEvent]],
      name: String): Seq[(String, Int, Long, Int, Long)] = {
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AckEvent](
      implicitly[org.apache.spark.sql.Encoder[AckEvent]], spark.sqlContext)
    val q = op(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.sql(s"SELECT * FROM $name ORDER BY topic, partition, commitOffset")
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4)))
        .toSeq
    } finally q.stop()
  }

  test("watermark advances across micro-batches (basic protocol)") {
    val batches = Seq(
      (0L until 5L).map(o => AckEvent("t", 0, o, "receive")) ++
        Seq(AckEvent("t", 0, 4L, "ack"), AckEvent("t", 0, 3L, "ack")),
      Seq(AckEvent("t", 0, 1L, "ack"), AckEvent("t", 0, 2L, "ack")),
      Seq(AckEvent("t", 0, 5L, "ack"),
        AckEvent("t", 1, 10L, "receive"), AckEvent("t", 1, 11L, "ack")))
    val rows = runThrough(AckStateTws.updates(_, 100), batches, "tws_basic")
    val byPart = rows.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    assert(byPart == Map(0 -> 5L, 1 -> 11L))
  }

  test("capacity overflow defers receives and their follow-up events") {
    val batches = Seq(
      (0L to 3L).map(o => AckEvent("t", 0, o, "receive")) ++
        (1L to 4L).map(o => AckEvent("t", 0, o, "ack")),
      Seq(AckEvent("t", 0, 4L, "receive"), AckEvent("t", 0, 5L, "ack")))
    val rows = runThrough(AckStateTws.updates(_, 3), batches, "tws_cap")
    val commits = rows.map(_._3)
    assert(commits.contains(4L), s"deferred ack was lost: $commits")
    assert(commits.max == 5L)
  }

  test("equivalent to AckStateOp on randomized multi-trigger streams") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      // random interleaving of receives/acks/nacks/cancels over 2 partitions
      // with gaps in the offset sequence and a small capacity to force
      // deferral; acks may arrive before, with, or after their receive
      val events = (0 until 2).flatMap { p =>
        val offsets = (0 until 60).scanLeft(0L)((o, _) => o + 1 + rnd.nextInt(3)).tail
        offsets.flatMap { o =>
          val kinds = Seq("receive") ++
            (if (rnd.nextInt(10) == 0) Seq("nack") else Nil) ++
            (if (rnd.nextInt(15) == 0) Seq("cancel") else Nil) ++
            Seq("ack")
          kinds.map(k => AckEvent("t", p, if (k == "receive") o else o + 1, k))
        }
      }
      val shuffled = rnd.shuffle(events)
      // split into 4 triggers at random boundaries
      val n = shuffled.size
      val cuts = (Seq(0) ++ Seq.fill(3)(rnd.nextInt(n)).sorted ++ Seq(n)).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }

      val fmgws = runThrough(AckStateOp.updates(_, 16), batches, s"eq_fmgws_$round")
      val tws = runThrough(AckStateTws.updates(_, 16), batches, s"eq_tws_$round")
      assert(tws == fmgws, s"round $round diverged")
      assert(tws.nonEmpty)
    }
  }
}
