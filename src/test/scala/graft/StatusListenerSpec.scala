package graft

import graft.control.{AutoScaler, JobStatusStore, StatusListener}
import graft.sources.GraftBroker
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The listener bridge end-to-end: a REAL graft-queue streaming query's
 * progress events land in the JobStatusStore as heartbeats (with offsets
 * parsed from the source's checkpoint dialect), a terminal state always
 * lands despite the cadence gate, and the AutoScaler can be driven from
 * the retained history — the reference's worker-heartbeat → master-store →
 * scaler loop (ControllerWorkerService.java:46-260) over Spark's actual
 * listener bus.
 */
class StatusListenerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def await(what: String, timeoutMs: Long = 30000L)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(cond, s"timed out after ${timeoutMs}ms waiting for: $what")
  }

  test("streaming progress heartbeats land in the store; termination always lands") {
    GraftBroker.reset()
    GraftBroker.createTopic("lst", 2)
    (0 until 2).foreach(p => (0 until 5).foreach(i =>
      GraftBroker.produce("lst", Some(p), null, s"m$p-$i".getBytes)))

    // cadence 0 so every batch's heartbeat is retained — the test asserts
    // CONTENT; the 1 s coalescing has its own JobStatusStoreSpec coverage
    val store = new JobStatusStore(cadenceMs = 0L)
    val listener = new StatusListener(store, bytesPerMsgEstimate = 100.0)
    spark.streams.addListener(listener)
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-lst").toString
      val q = spark.readStream.format("graft-queue")
        .option("topics", "lst")
        .option("groupid", "lst-group")
        .option("startingoffsets", "earliest")
        .load()
        .writeStream.queryName("lst_pipeline")
        .format("noop").option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      // second batch: its progress event carries a non-null startOffset =
      // the durably committed position after batch 0 (batch 0's own
      // startOffset is null in Spark's progress, mapped to -1)
      (0 until 2).foreach(p =>
        GraftBroker.produce("lst", Some(p), null, s"late$p".getBytes))
      q.processAllAvailable()

      await("RUNNING heartbeats for both batches") {
        store.history("lst_pipeline").count(_.state == "RUNNING") >= 2
      }
      val running = store.history("lst_pipeline").filter(_.state == "RUNNING")
      // offsets came from the graft-queue offset JSON: 12 records total
      assert(running.map(_.readOffset).max == 12L,
        s"summed end offsets should reach 12, got ${running.map(_.readOffset)}")
      // the second batch started from batch 0's committed position (10);
      // batch 0 itself reports -1 (no startOffset exists yet)
      assert(running.map(_.commitOffset).contains(10L),
        s"expected a heartbeat with commitOffset 10, got ${running.map(_.commitOffset)}")
      assert(running.forall(_.cpuUsage >= 0.0) && running.forall(_.cpuUsage <= 1.0))

      // the scaler is driven from retained history, not ad-hoc snapshots
      val scaler = new AutoScaler(AutoScaler.Config(calibrateMs = 0L))
      assert(store.driveScaler(scaler, "lst_pipeline").isDefined)

      q.stop()
      await("terminal state lands despite arriving right after a heartbeat") {
        store.latest("lst_pipeline").exists(_.state == "CANCELED")
      }
    } finally spark.streams.removeListener(listener)
  }
}
