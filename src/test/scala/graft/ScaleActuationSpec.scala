package graft

import graft.control.{AutoScaler, JobManager, JobStatusStore, ScalingLoop, StatusListener}
import graft.model._
import graft.sources.GraftBroker
import graft.streaming._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/**
 * The LIVE autoscale actuation loop, end to end: a GraftQueue-fed query runs
 * under a small FlowControl quota, its progress events flow through
 * [[StatusListener]] into [[JobStatusStore]], the store drives the
 * [[AutoScaler]], the [[ScalingLoop]] decision becomes an updated spec, and
 * [[JobManager.update]] re-runs the query so the new quota OBSERVABLY
 * changes the per-trigger batch size — the reference's UPDATE_JOB →
 * ProcessorImpl.updateQuota path (reference:
 * uforwarder/.../worker/processor/ProcessorImpl.java:1316-1365), expressed
 * as checkpoint-resumed re-run with the new maxoffsetspertrigger.
 */
class ScaleActuationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.metricsEnabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private object BrokerQueueStore extends QueueStore {
    def produce(outcomes: Dataset[ForwardingEngine.Outcome]): Unit = {
      outcomes.filter(col("destination") =!= "")
        .select(col("destination").as("topic"),
          col("outKey").as("key"), col("outValue").as("value"))
        .write.format("graft-queue").mode("append").save()
      ()
    }
  }

  test("autoscale actuation E2E: listener -> store -> scaler -> update changes trigger size") {
    GraftBroker.reset(); TestConsumer.reset()
    TestConsumer.behaviors += "scale-ok" -> (_ => DispatchResult("OK", None, overdue = false))
    val topic = "scale-live-topic"; val group = "scale-live-group"
    GraftBroker.createTopic(topic, 1)
    (1 to 60).foreach(i => GraftBroker.produce(topic, Some(0), s"k$i".getBytes, s"v$i".getBytes))

    // quota phase 1: 5 msgs/sec × 1 s trigger = 5 records per micro-batch
    val spec1 = JobSpec(
      jobGroupId = s"${topic}__$group", cluster = "local-cluster",
      topic = topic, consumerGroup = group,
      rpc = RpcSpec("grpc://consumer", s"kafka.consumerproxy.$group/$topic"),
      flowControl = FlowControl(5.0, Double.MaxValue, Double.MaxValue))

    val store = new JobStatusStore(cadenceMs = 0L) // accept every heartbeat
    val listener = new StatusListener(store)
    spark.streams.addListener(listener)
    val jm = new JobManager(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("scale-actuation").toString
    try {
      val q1 = jm.run(spec1, MockDispatcherFactory("scale-ok"), "local-cluster",
        QueueJobs.liveStream(spark, spec1), BrokerQueueStore, ckpt)
      q1.processAllAvailable()
      // the quota held: every non-empty micro-batch admitted at most 5 rows,
      // so draining 60 records took at least 12 triggers
      val sizes1 = q1.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
      assert(sizes1.nonEmpty && sizes1.forall(_ <= 5L),
        s"phase-1 batches must respect the 5-row cap: $sizes1")
      assert(sizes1.size >= 12, s"expected >=12 capped batches, got ${sizes1.size}")
      assert((1 to 60).forall(i => TestConsumer.count("scale-ok", s"v$i") == 1))

      // progress events reached the status store through the listener
      val history = store.history(spec1.jobGroupId)
      assert(history.nonEmpty, "StatusListener should have fed the store")
      assert(history.forall(_.state == "RUNNING"))

      // store -> scaler -> decision -> updated spec (quota >= one worker's
      // 4000 msgs/sec engineered target)
      val scaler = new AutoScaler(AutoScaler.Config(calibrateMs = 0L))
      val loop = new ScalingLoop(jm, scaler, statusStore = store)
      val decisions = loop.tick(System.currentTimeMillis())
      assert(decisions.map(_.jobGroupId) == Seq(spec1.jobGroupId))
      val spec2 = loop.updatedSpec(spec1, decisions.head)
      assert(spec2.flowControl.messagesPerSec >= 4000.0)

      // actuate: UPDATE_JOB = re-run from the checkpoint with the new spec;
      // the fresh backlog then drains in a single uncapped trigger. Stop the
      // capped query BEFORE producing the backlog — still live at
      // ProcessingTime(0), it would otherwise steal a 5-record batch of it
      jm.cancel(spec1.jobGroupId)
      (61 to 100).foreach(i => GraftBroker.produce(topic, Some(0), s"k$i".getBytes, s"v$i".getBytes))
      val q2 = jm.update(spec2, MockDispatcherFactory("scale-ok"), "local-cluster",
        QueueJobs.liveStream(spark, spec2), BrokerQueueStore, ckpt)
      q2.processAllAvailable()
      val sizes2 = q2.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
      assert(sizes2.exists(_ >= 40L),
        s"post-update trigger should admit the whole 40-record backlog: $sizes2")
      // exactly-once held across the quota restart
      assert((1 to 100).forall(i => TestConsumer.count("scale-ok", s"v$i") == 1),
        "no record may be lost or redelivered across the UPDATE_JOB restart")
      // the terminal CANCELED heartbeat from the phase-1 stop landed too
      assert(store.history(spec1.jobGroupId).exists(_.state == "CANCELED"))
    } finally {
      spark.streams.removeListener(listener)
      jm.stopAll()
    }
  }
}
