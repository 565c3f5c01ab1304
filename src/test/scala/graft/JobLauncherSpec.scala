package graft

import graft.model._
import graft.sources.GraftBroker
import graft.streaming.{ForwardingEngine, JobLauncher}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** JobType-dispatched launch: one entry point turns a JobSpec into the
  * right running pipeline (PipelineFactoryImpl.createPipeline analog). */
class JobLauncherSpec extends AnyFunSuite {

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

  private def ckpt(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-launch-$tag").toString

  private def stream(topics: String) = Some(ForwardingEngine.fromSourceFrame(
    spark.readStream.format("graft-queue")
      .option("topics", topics).option("startingoffsets", "earliest").load()))

  test("launch dispatches a forwarding job") {
    GraftBroker.reset(); TestConsumer.reset()
    TestConsumer.behaviors += "jl-fwd" -> (_ => graft.streaming.DispatchResult("OK", None, overdue = false))
    GraftBroker.createTopic("jl-fwd-t", 1)
    (1 to 3).foreach(i => GraftBroker.produce("jl-fwd-t", Some(0), s"k$i".getBytes, s"v$i".getBytes))
    val spec = JobSpec("jl-fwd-t__g", "local-cluster", "jl-fwd-t", "g",
      rpc = RpcSpec("grpc://svc", "p"))
    val store = new graft.streaming.QueueStore {
      def produce(o: org.apache.spark.sql.Dataset[ForwardingEngine.Outcome]): Unit = { o.count(); () }
    }
    val q = JobLauncher.launch(spark, spec, stream("jl-fwd-t"), ckpt("fwd"),
      JobLauncher.Deps(dispatcherFactory = MockDispatcherFactory("jl-fwd"), store = store))
    try await("3 delivered")((1 to 3).forall(i => TestConsumer.count("jl-fwd", s"v$i") == 1))
    finally q.stop()
  }

  test("launch dispatches a replication job") {
    GraftBroker.reset()
    GraftBroker.createTopic("jl-rep-src", 1)
    (1 to 2).foreach(i => GraftBroker.produce("jl-rep-src", Some(0), s"k$i".getBytes, s"v$i".getBytes))
    val spec = JobSpec("jl-rep__g", "cluster-a", "jl-rep-src", "g",
      rpc = RpcSpec("", ""), jobTypeName = JobType.Replication.name,
      kafkaDispatch = Some(DispatchTarget("cluster-b", "jl-rep-dst")))
    val q = JobLauncher.launch(spark, spec, stream("jl-rep-src"), ckpt("rep"))
    try await("2 replicated")(GraftBroker.endOffsets("jl-rep-dst").values.sum == 2L)
    finally q.stop()
  }

  test("launch dispatches a load-gen job at the flow-control rate") {
    GraftBroker.reset()
    GraftBroker.createTopic("jl-lg-t", 1)
    val spec = JobSpec("jl-lg__g", "local", "unused", "g",
      rpc = RpcSpec("", ""), jobTypeName = JobType.LoadGen.name,
      flowControl = FlowControl(100.0, Double.MaxValue, Double.MaxValue),
      kafkaDispatch = Some(DispatchTarget("local", "jl-lg-t")))
    val q = JobLauncher.launch(spark, spec, None, ckpt("lg"))
    try await("load-gen produced records")(GraftBroker.endOffsets("jl-lg-t").values.sum >= 20L)
    finally q.stop()
  }

  test("launch dispatches an audit job producing windowed JSON audit records") {
    GraftBroker.reset()
    GraftBroker.createTopic("jl-audit-src", 1)
    val t0 = 1700000000000L // ms, window-aligned enough
    // minute 0: two records, minute 1: one, then a late-minute record that
    // advances the watermark past both windows
    GraftBroker.produce("jl-audit-src", Some(0), "a".getBytes, "m1".getBytes, timestampMs = t0 + 10000)
    GraftBroker.produce("jl-audit-src", Some(0), "b".getBytes, "m2".getBytes, timestampMs = t0 + 20000)
    GraftBroker.produce("jl-audit-src", Some(0), "c".getBytes, "m3".getBytes, timestampMs = t0 + 70000)
    GraftBroker.produce("jl-audit-src", Some(0), "d".getBytes, "m4".getBytes, timestampMs = t0 + 240000)
    val spec = JobSpec("jl-audit__g", "local", "jl-audit-src", "g",
      rpc = RpcSpec("", ""), jobTypeName = JobType.Audit.name,
      kafkaDispatch = Some(DispatchTarget("local", "jl-audit-out")))
    val q = JobLauncher.launch(spark, spec, stream("jl-audit-src"), ckpt("audit"))
    try {
      await("closed windows audited", 60000L)(
        GraftBroker.endOffsets("jl-audit-out").values.sum >= 2L)
      val recs = GraftBroker.fetch("jl-audit-out", 0, 0L,
        GraftBroker.endOffsets("jl-audit-out")(0))
      val bodies = recs.map(r => new String(r.value))
      assert(bodies.forall(_.contains("\"audited_topic\":\"jl-audit-src\"")))
      assert(bodies.exists(_.contains("\"n\":2")), bodies.mkString("\n")) // minute-0 window
    } finally q.stop()
  }
}
