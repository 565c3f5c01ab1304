package graft

import graft.control.{AdminService, JobGroupJson, JobManager, ParquetJobStore, StatusServer}
import graft.model._
import graft.streaming.ForwardingEngine.KafkaRecord
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The admin mutation surface — MasterAdminService analog
 * (reference: master_admin_service.proto:17-37, ControllerAdminService.java).
 * The E2E here is the reference's operator workflow: submit a job group over
 * the wire, watch the rebalance tick start it, flip its state, delete it.
 */
class AdminServiceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def fullSpec(id: String) = JobSpec(
    jobGroupId = id, cluster = "local", topic = "t", consumerGroup = "g",
    rpc = RpcSpec("grpc://svc", "kafka.consumerproxy.g/t", 2000L, 3, "t__g__dlq"),
    retryEnabled = true,
    retryTiers = Seq(RetryTier("t__g__1__retry", 1000L, 3), RetryTier("t__g__2__retry", 10000L, 2)),
    resqTopic = "t__g__resq",
    flowControl = FlowControl(4000.0, 16777216.0, 1000.0),
    processingDelayMs = 250L,
    security = SecuritySpec(Seq("spiffe://ns/svc"), isSecure = true,
      multiTenancyEnabled = true, Map("ssl.truststore.location" -> "/tls/ca")),
    jobTypeName = JobType.ConsumerToRpcDispatcher.name)

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

  test("codec round-trips a fully-populated document") {
    val doc = AdminService.StoredGroup(
      spec = fullSpec("""t__g"\evil"""), // hostile id must survive the wire
      state = AdminService.JobStateCanceled,
      range = Some(GroupRange(
        startTimestampMs = 1700000000000L, endTimestampMs = 1700000100000L,
        partitionOffsetRanges = Seq(PartitionOffsetRange(0, 5L, 10L), PartitionOffsetRange(2, 0L, 7L)))))
    assert(JobGroupJson.parseDoc(JobGroupJson.toJson(doc)) == doc)
    // a bare spec (no jobGroup wrapper) parses too, defaulting state/range
    val bare = JobGroupJson.parseDoc(
      """{"jobGroupId":"b__g","cluster":"c","topic":"t","consumerGroup":"g",
        |"rpc":{"uri":"grpc://svc","procedure":"p"}}""".stripMargin)
    assert(bare.spec.jobGroupId == "b__g")
    assert(bare.state == AdminService.JobStateRunning && bare.range.isEmpty)
    assert(bare.spec.flowControl == FlowControl.unlimited)
  }

  test("replication document round-trips dispatch target") {
    val doc = AdminService.StoredGroup(
      spec = fullSpec("r__g").copy(
        jobTypeName = JobType.Replication.name,
        kafkaDispatch = Some(DispatchTarget("dst", "t-copy", Some(3), dedupEnabled = true, isSecure = true))))
    assert(JobGroupJson.parseDoc(JobGroupJson.toJson(doc)) == doc)
  }

  test("validation rejects invalid documents, naming the field") {
    def rejects(body: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](JobGroupJson.parseDoc(body))
      assert(e.getMessage.contains(fragment), s"'${e.getMessage}' should mention '$fragment'")
    }
    rejects("""not json""", "malformed JSON")
    rejects("""[1,2]""", "JSON object")
    rejects("""{"cluster":"c","topic":"t","consumerGroup":"g"}""", "jobGroupId")
    rejects("""{"jobGroupId":"","cluster":"c","topic":"t","consumerGroup":"g"}""", "non-empty")
    rejects("""{"jobGroupId":"x","cluster":"c","topic":"t","consumerGroup":"g"}""", "rpc")
    rejects(
      """{"jobGroupId":"x","cluster":"c","topic":"t","consumerGroup":"g",
        |"jobTypeName":"NOT_A_TYPE"}""".stripMargin, "NOT_A_TYPE")
    rejects(
      """{"jobGroupId":"x","cluster":"c","topic":"t","consumerGroup":"g",
        |"jobTypeName":"REPLICATION"}""".stripMargin, "kafkaDispatch")
    rejects(
      """{"jobGroup":{"jobGroupId":"x","cluster":"c","topic":"t","consumerGroup":"g",
        |"rpc":{"uri":"u","procedure":"p"}},"jobGroupState":"JOB_STATE_BOGUS"}""".stripMargin,
      "JOB_STATE_BOGUS")
    rejects(
      """{"jobGroup":{"jobGroupId":"x","cluster":"c","topic":"t","consumerGroup":"g",
        |"rpc":{"uri":"u","procedure":"p"}},
        |"range":{"partitionOffsetRanges":[{"partition":0,"startOffset":9,"endOffset":3}]}}""".stripMargin,
      "startOffset")
    rejects(
      """{"jobGroup":{"jobGroupId":"x","cluster":"c","topic":"t","consumerGroup":"g",
        |"rpc":{"uri":"u","procedure":"p"},"flowControl":{"messagesPerSec":0}}}""".stripMargin,
      "flowControl")
  }

  test("admin E2E over HTTP: add -> rebalance tick -> RUNNING -> state flip -> delete") {
    val dir = java.nio.file.Files.createTempDirectory("admin-store").toString
    val store = new ParquetJobStore(spark, dir)
    val ad = new AdminService(store)
    val jm = new JobManager(spark)
    val srv = new StatusServer(jm, admin = Some(ad))
    val port = srv.start()
    val base = s"http://127.0.0.1:$port"
    try {
      // 1. submit the group over the wire (the operator's first touch)
      val body =
        """{"jobGroup":{"jobGroupId":"t__g","cluster":"local","topic":"t",
          |"consumerGroup":"g","rpc":{"uri":"grpc://svc","procedure":"kafka.consumerproxy.g/t"}},
          |"jobGroupState":"JOB_STATE_RUNNING"}""".stripMargin
      val (addCode, addResp) = http("POST", s"$base/admin/jobgroup", Some(body))
      assert(addCode == 200, addResp)
      // add is idempotent: a second POST returns the stored doc, same 200
      assert(http("POST", s"$base/admin/jobgroup", Some(body))._1 == 200)
      // invalid documents are 400 with the offending field named
      val (badCode, badResp) = http("POST", s"$base/admin/jobgroup", Some("""{"cluster":"c"}"""))
      assert(badCode == 400 && badResp.contains("jobGroupId"))

      // 2. the rebalance tick picks the new group up and issues RUN
      val (_, cmds) = jm.rebalance(ad.expected(_ => 2), ad.scaleOverrides(_ => 1.0), Seq("driver"))
      assert(cmds.collect { case jm.RunGroup(g, _) => g } == Seq("t__g"))

      // 3. execute the command: pipeline goes RUNNING and processes rows
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KafkaRecord](
        implicitly[org.apache.spark.sql.Encoder[KafkaRecord]], spark.sqlContext)
      input.addData((0 until 5).map(i =>
        KafkaRecord(Array[Byte](1), s"m$i".getBytes, "t", 0, i.toLong, 0L, Map.empty)))
      val ckpt = java.nio.file.Files.createTempDirectory("admin-ckpt").toString
      val q = jm.run(ad.get("t__g").get.spec, AlwaysOkDispatcherFactory, "local",
        input.toDS(), InMemoryQueueStore, ckpt)
      q.processAllAvailable()
      assert(jm.running == Seq("t__g"))
      assert(jm.status("t__g").exists(_.numInputRows == 5))

      // 4. GetAll (array + streamed ndjson agree)
      val (allCode, allJson) = http("GET", s"$base/admin/jobgroups")
      assert(allCode == 200)
      val parsed = org.json4s.jackson.JsonMethods.parse(allJson)
      assert(parsed.children.size == 1)
      val (ndCode, nd) = http("GET", s"$base/admin/jobgroups?format=ndjson")
      assert(ndCode == 200 && nd.trim.linesIterator.size == 1)
      assert(org.json4s.jackson.JsonMethods.parse(nd.trim) == parsed.children.head)

      // 5. flip state over the wire -> next tick cancels
      val (stCode, stResp) = http("POST", s"$base/admin/jobgroup/state",
        Some("""{"id":"t__g","state":"JOB_STATE_CANCELED"}"""))
      assert(stCode == 200 && stResp.contains("JOB_STATE_CANCELED"))
      val (_, cmds2) = jm.rebalance(ad.expected(_ => 2), ad.scaleOverrides(_ => 1.0), Seq("driver"))
      assert(cmds2.collect { case jm.CancelGroup(g) => g } == Seq("t__g"))
      cmds2.foreach { case jm.CancelGroup(g) => jm.cancel(g); case _ => () }
      assert(jm.running.isEmpty)
      // unknown states are rejected at the boundary
      assert(http("POST", s"$base/admin/jobgroup/state",
        Some("""{"id":"t__g","state":"NOPE"}"""))._1 == 400)

      // 6. delete; the group is gone from every read path
      assert(http("DELETE", s"$base/admin/jobgroup?id=t__g")._1 == 200)
      assert(http("DELETE", s"$base/admin/jobgroup?id=t__g")._1 == 404)
      assert(http("GET", s"$base/admin/jobgroup?id=t__g")._1 == 404)
      assert(ad.expected(_ => 2).isEmpty)
      // absent-id and bad-method hygiene
      assert(http("DELETE", s"$base/admin/jobgroup")._1 == 400)
      assert(http("OPTIONS", s"$base/admin/jobgroup")._1 == 405)
    } finally { srv.stop(); jm.stopAll() }
  }

  test("update replaces the spec but keeps stored state; persistence survives restart") {
    val dir = java.nio.file.Files.createTempDirectory("admin-store2").toString
    val store = new ParquetJobStore(spark, dir)
    val ad = new AdminService(store)
    val doc = AdminService.StoredGroup(fullSpec("u__g"),
      range = Some(GroupRange(startTimestampMs = 1L, endTimestampMs = 2L)))
    ad.add(doc)
    ad.updateState("u__g", AdminService.JobStateCanceled)
    // update: new quota arrives, CANCELED state must stick (reference
    // updateJobGroup keeps the stored state)
    val updated = ad.update(doc.copy(
      spec = doc.spec.copy(flowControl = FlowControl(9000.0, 1e9, 500.0)),
      state = AdminService.JobStateRunning)).get
    assert(updated.state == AdminService.JobStateCanceled)
    assert(updated.spec.flowControl.messagesPerSec == 9000.0)
    // updating an absent group is None (-> 404 on the wire)
    assert(ad.update(doc.copy(spec = doc.spec.copy(jobGroupId = "ghost"))).isEmpty)
    // a fresh service over the same store sees the exact same documents
    val ad2 = new AdminService(new ParquetJobStore(spark, dir))
    assert(ad2.all == ad.all)
    assert(ad2.get("u__g").get.range.contains(GroupRange(1L, 2L)))
  }
}
