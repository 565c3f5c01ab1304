package graft

import graft.control.{AdminService, AutoScaler, ControlPlane}
import graft.model._
import graft.sources.GraftBroker
import graft.streaming._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/**
 * The one-call control-plane boot ([[ControlPlane]]): the full operator
 * workflow — boot, submit a job group over HTTP, watch the tick start it
 * against the live connector, flip its state, watch the tick cancel it —
 * plus the lease watchdog stopping a wedged plane's dispatch.
 */
class ControlPlaneBootSpec extends AnyFunSuite {

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

  private def http(method: String, url: String, body: Option[String] = None): (Int, String) = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(b.getBytes("UTF-8")) finally os.close()
    }
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val payload =
      if (in == null) "" else try new String(in.readAllBytes(), "UTF-8") finally in.close()
    (code, payload)
  }

  test("boot -> HTTP submit -> tick runs the group live -> state flip -> tick cancels") {
    GraftBroker.reset(); TestConsumer.reset()
    TestConsumer.behaviors += "cp-ok" -> (_ => DispatchResult("OK", None, overdue = false))
    val topic = "cp-topic"; val group = "cp-group"
    GraftBroker.createTopic(topic, 2)
    (1 to 8).foreach(i => GraftBroker.produce(topic, Some(i % 2), s"k$i".getBytes, s"v$i".getBytes))

    val storeDir = java.nio.file.Files.createTempDirectory("cp-store").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("cp-ckpt").toString
    val cp = new ControlPlane(spark, storeDir, ckptDir,
      ControlPlane.Wiring(
        dispatcherFactory = MockDispatcherFactory("cp-ok"),
        localCluster = "local-cluster",
        queueStore = BrokerQueueStore,
        partitionsOf = s => GraftBroker.endOffsets(s.topic).size,
        scalerConfig = AutoScaler.Config(calibrateMs = 0L)))
    // manual ticks: the loop body is the unit under test, not the timer
    val port = cp.start(autoTick = false)
    val base = s"http://127.0.0.1:$port"
    try {
      // an empty plane ticks to a no-op
      val r0 = cp.tick()
      assert(r0.started.isEmpty && r0.cancelled.isEmpty)

      // operator's first touch: submit over the wire
      val (code, _) = http("POST", s"$base/admin/jobgroup", Some(
        s"""{"jobGroup":{"jobGroupId":"${topic}__$group","cluster":"local-cluster",
           |"topic":"$topic","consumerGroup":"$group",
           |"rpc":{"uri":"grpc://consumer","procedure":"kafka.consumerproxy.$group/$topic"}}}""".stripMargin))
      assert(code == 200)

      // next tick starts the pipeline against the live connector
      val r1 = cp.tick()
      assert(r1.started == Seq(s"${topic}__$group"))
      assert(cp.jobManager.running == Seq(s"${topic}__$group"))
      val deadline = System.currentTimeMillis() + 30000
      while ((1 to 8).exists(i => TestConsumer.count("cp-ok", s"v$i") != 1) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      (1 to 8).foreach(i => assert(TestConsumer.count("cp-ok", s"v$i") == 1, s"v$i"))
      // a tick while converged is a no-op (idempotent loop)
      val r2 = cp.tick()
      assert(r2.started.isEmpty && r2.cancelled.isEmpty)
      // heartbeats reached the store through the listener; the management
      // surface sees the running group
      assert(http("GET", s"$base/status/jobs")._2.contains(s"${topic}__$group"))

      // flip the desired state over the wire -> next tick cancels
      assert(http("POST", s"$base/admin/jobgroup/state",
        Some(s"""{"id":"${topic}__$group","state":"JOB_STATE_CANCELED"}"""))._1 == 200)
      val r3 = cp.tick()
      assert(r3.cancelled == Seq(s"${topic}__$group"))
      assert(cp.jobManager.running.isEmpty)
    } finally cp.stop()
  }

  test("autoTick: the background loop picks up a submitted group without manual ticks") {
    GraftBroker.reset(); TestConsumer.reset()
    TestConsumer.behaviors += "cp-auto" -> (_ => DispatchResult("OK", None, overdue = false))
    val topic = "cp-auto-topic"
    GraftBroker.createTopic(topic, 1)
    (1 to 3).foreach(i => GraftBroker.produce(topic, Some(0), s"k$i".getBytes, s"a$i".getBytes))
    val storeDir = java.nio.file.Files.createTempDirectory("cpa-store").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("cpa-ckpt").toString
    val cp = new ControlPlane(spark, storeDir, ckptDir,
      ControlPlane.Wiring(
        dispatcherFactory = MockDispatcherFactory("cp-auto"),
        localCluster = "local-cluster",
        queueStore = BrokerQueueStore,
        partitionsOf = _ => 1,
        scalerConfig = AutoScaler.Config(calibrateMs = 0L)),
      tickMs = 200L)
    val port = cp.start() // autoTick = true: the loop thread drives everything
    try {
      val (code, _) = http("POST", s"http://127.0.0.1:$port/admin/jobgroup", Some(
        s"""{"jobGroup":{"jobGroupId":"${topic}__g","cluster":"local-cluster",
           |"topic":"$topic","consumerGroup":"g",
           |"rpc":{"uri":"grpc://consumer","procedure":"p"}}}""".stripMargin))
      assert(code == 200)
      val deadline = System.currentTimeMillis() + 30000
      while ((1 to 3).exists(i => TestConsumer.count("cp-auto", s"a$i") != 1) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      (1 to 3).foreach(i => assert(TestConsumer.count("cp-auto", s"a$i") == 1, s"a$i"))
      // poll: the 200 ms tick loop may be mid-update (cancel+run) when we
      // look, so `running` can transiently be empty without anything wrong
      val runDeadline = System.currentTimeMillis() + 10000
      while (cp.jobManager.running != Seq(s"${topic}__g") &&
        System.currentTimeMillis() < runDeadline) Thread.sleep(100)
      assert(cp.jobManager.running == Seq(s"${topic}__g"))
    } finally cp.stop()
  }

  test("quota actuation: deferred past the starting tick, applied on a later one") {
    GraftBroker.reset(); TestConsumer.reset()
    TestConsumer.behaviors += "cp-quota" -> (_ => DispatchResult("OK", None, overdue = false))
    val topic = "cp-quota-topic"
    GraftBroker.createTopic(topic, 1)
    (1 to 8).foreach(i => GraftBroker.produce(topic, Some(0), s"k$i".getBytes, s"q$i".getBytes))
    val storeDir = java.nio.file.Files.createTempDirectory("cpq-store").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("cpq-ckpt").toString
    val cp = new ControlPlane(spark, storeDir, ckptDir,
      ControlPlane.Wiring(
        dispatcherFactory = MockDispatcherFactory("cp-quota"),
        localCluster = "local-cluster",
        queueStore = BrokerQueueStore,
        partitionsOf = _ => 1,
        scalerConfig = AutoScaler.Config(calibrateMs = 0L)))
    cp.start(autoTick = false)
    try {
      cp.admin.add(AdminService.StoredGroup(JobSpec(
        jobGroupId = s"${topic}__g", cluster = "local-cluster", topic = topic,
        consumerGroup = "g", rpc = RpcSpec("grpc://consumer", "p"),
        flowControl = FlowControl(5.0, Double.MaxValue, Double.MaxValue))))
      // starting tick: the group comes up but is NEVER quota-bounced on its
      // own empty heartbeat (the batch-0 checkpoint race this gate closes)
      val r1 = cp.tick()
      assert(r1.started == Seq(s"${topic}__g") && r1.quotaUpdated.isEmpty)
      val deadline = System.currentTimeMillis() + 30000
      while ((1 to 8).exists(i => TestConsumer.count("cp-quota", s"q$i") != 1) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      (1 to 8).foreach(i => assert(TestConsumer.count("cp-quota", s"q$i") == 1, s"q$i"))
      // later ticks see real throughput history -> the scaler's quota
      // (>= one worker's 4000 msgs/s target, a >10% move off 5.0) actuates
      val updDeadline = System.currentTimeMillis() + 30000
      var updated = Seq.empty[String]
      while (updated.isEmpty && System.currentTimeMillis() < updDeadline) {
        updated = cp.tick().quotaUpdated
        if (updated.isEmpty) Thread.sleep(100)
      }
      assert(updated == Seq(s"${topic}__g"))
      assert(cp.jobManager.running == Seq(s"${topic}__g"))
      // the restarted query still drains new records exactly once
      (9 to 12).foreach(i => GraftBroker.produce(topic, Some(0), s"k$i".getBytes, s"q$i".getBytes))
      val drain = System.currentTimeMillis() + 30000
      while ((9 to 12).exists(i => TestConsumer.count("cp-quota", s"q$i") != 1) &&
        System.currentTimeMillis() < drain) Thread.sleep(50)
      (1 to 12).foreach(i => assert(TestConsumer.count("cp-quota", s"q$i") == 1, s"q$i"))
    } finally cp.stop()
  }

  test("retention duty cycle: the tick prunes an over-retention artifact root on cadence") {
    GraftBroker.reset()
    val storeDir = java.nio.file.Files.createTempDirectory("cp-store-ret").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("cp-ckpt-ret").toString
    val root = java.nio.file.Files.createTempDirectory("cp-models-ret")
    spark.conf.set("spark.graft.artifact.root", root.toString)
    try {
      // an over-retention model-artifact root: three superseded ivf_full
      // generations + the live one (all aged mtimes, no held locks)
      (1 to 4).foreach { i =>
        val d = root.resolve(s"ivf_full_000$i")
        java.nio.file.Files.createDirectories(d)
        java.nio.file.Files.writeString(d.resolve("_GRAFT_MODEL_READY"), "")
        java.nio.file.Files.setLastModifiedTime(d,
          java.nio.file.attribute.FileTime.fromMillis(1000000L * i))
      }
      // a rolled band-state table with buckets whose members curation has
      // since removed: the compaction duty must shrink it on the tick
      // (the warehouse-side sibling of the model prune — verdict's
      // "wire band-state compaction into the duty cycle")
      import spark.implicits._
      val bandStatePath = root.resolve("band_state.parquet").toString
      Seq((0, "a", Seq(2L, 3L, 9L)), (1, "b", Seq(4L)), (1, "c", Seq(2L, 6L)))
        .toDF("band", "band_sig", "ids")
        .write.mode("overwrite").parquet(bandStatePath)
      val liveIds = Seq(2L, 3L, 6L).toDF("doc_id")

      var flaky = 0
      val cp = new ControlPlane(spark, storeDir, ckptDir,
        ControlPlane.Wiring(
          dispatcherFactory = MockDispatcherFactory("cp-ok"),
          localCluster = "local-cluster",
          queueStore = BrokerQueueStore,
          partitionsOf = _ => 1,
          scalerConfig = AutoScaler.Config(calibrateMs = 0L),
          retentionDuties = Seq(
            "model-artifacts" -> (() => {
              graft.operators.SimilarityOps.pruneModelArtifacts(spark, keepLast = 1); ()
            }),
            "band-compaction" -> (() => {
              // materialize BEFORE the overwrite (read-your-own-input)
              val st = spark.read.parquet(bandStatePath)
              val schema = st.schema
              val compacted = graft.operators.SimilarityOps
                .compactBandState(st, liveIds).collect()
              spark.createDataFrame(
                  spark.sparkContext.parallelize(compacted.toIndexedSeq), schema)
                .write.mode("overwrite").parquet(bandStatePath)
            }),
            // a failing duty must be isolated: logged, skipped, and never
            // allowed to break the rebalance loop or the other duties
            "flaky" -> (() => { flaky += 1; sys.error("duty boom") })),
          retentionEveryTicks = 2))
      cp.start(autoTick = false)
      try {
        // boot tick runs the duty cycle immediately: the artifact root
        // shrinks to the newest ivf_full artifact, the band state
        // compacts (bucket "b" emptied → dropped, 9 filtered from "a"),
        // and the failing duty is not reported
        val r1 = cp.tick()
        assert(r1.retained == Seq("model-artifacts", "band-compaction"),
          s"expected both healthy duties reported, got ${r1.retained}")
        assert(flaky == 1, "the failing duty must still have been attempted")
        val left = java.nio.file.Files.list(root).toArray.map(_.toString)
          .filterNot(_.contains("band_state")).sorted
        assert(left.length == 1 && left.head.endsWith("ivf_full_0004"),
          s"expected only the newest artifact kept, got ${left.mkString(", ")}")
        val compacted = spark.read.parquet(bandStatePath)
          .collect().map(r => (r.getInt(0), r.getString(1), r.getSeq[Long](2).toList)).toSet
        assert(compacted == Set((0, "a", List(2L, 3L)), (1, "c", List(2L, 6L))),
          s"band state not compacted on tick: $compacted")

        // off-cadence tick: no duties run
        val r2 = cp.tick()
        assert(r2.retained.isEmpty && flaky == 1, "duties ran off-cadence")
        // next cadence boundary: duties run again (idempotent re-runs)
        val r3 = cp.tick()
        assert(r3.retained == Seq("model-artifacts", "band-compaction") && flaky == 2)
      } finally cp.stop()
    } finally {
      spark.conf.unset("spark.graft.artifact.root")
      TestFs.deleteRecursively(root)
    }
  }

  test("lease watchdog: a silent tick loop stops dispatch after the lease") {
    GraftBroker.reset(); TestConsumer.reset()
    TestConsumer.behaviors += "cp-lease" -> (_ => DispatchResult("OK", None, overdue = false))
    val topic = "cp-lease-topic"
    GraftBroker.createTopic(topic, 1)
    GraftBroker.produce(topic, Some(0), "k".getBytes, "v".getBytes)
    val storeDir = java.nio.file.Files.createTempDirectory("cpl-store").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("cpl-ckpt").toString
    var now = 0L
    val cp = new ControlPlane(spark, storeDir, ckptDir,
      ControlPlane.Wiring(
        dispatcherFactory = MockDispatcherFactory("cp-lease"),
        localCluster = "local-cluster",
        queueStore = BrokerQueueStore,
        partitionsOf = _ => 1),
      clock = () => now)
    cp.start(autoTick = false)
    try {
      cp.admin.add(AdminService.StoredGroup(JobSpec(
        jobGroupId = s"${topic}__g", cluster = "local-cluster", topic = topic,
        consumerGroup = "g", rpc = RpcSpec("grpc://consumer", "p"))))
      cp.tick()
      assert(cp.jobManager.running.nonEmpty)
      // the tick loop goes silent past the 21 s lease: the watchdog's
      // enforce stops all dispatch (here invoked directly — the thread
      // wrapper is a timer around exactly this call)
      now = 21001L
      assert(cp.lease.enforce() == Seq(s"${topic}__g"))
      assert(cp.jobManager.running.isEmpty)
    } finally cp.stop()
  }
}
