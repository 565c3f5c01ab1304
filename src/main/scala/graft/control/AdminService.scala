package graft.control

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.model._

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/**
 * Admin mutation surface — the MasterAdminService analog
 * (reference: idl/src/main/proto/kafka/datatransfer/rpc/
 * master_admin_service.proto:17-37 — AddJobGroup / UpdateJobGroup /
 * UpdateJobGroupState / DeleteJobGroup / GetJobGroup / streamed
 * GetAllJobGroups — handled by controller/rpc/ControllerAdminService.java
 * with its validate-then-store shape over Store<String, StoredJobGroup>).
 *
 * Semantics mirrored from the reference handlers:
 *  - add is IDEMPOTENT: an existing group is returned unchanged, not
 *    overwritten (ControllerAdminService.addJobGroup's get-before-create);
 *  - update replaces the job-group document but KEEPS the stored state
 *    (updateJobGroup builds from the old StoredJobGroup);
 *  - updateState only flips the desired state (RUNNING/CANCELED);
 *  - delete removes the document outright.
 *
 * Every mutation persists the full document set as a new store version
 * ([[ParquetJobStore.saveGroups]] — the ZKStore/VersionedProto analog), so
 * a restarted driver reloads the exact admin state. The [[JobManager]]
 * rebalance tick consumes [[expected]]/[[scaleOverrides]] — a mutation
 * needs no push path; the next tick observes the new document set, exactly
 * like the reference's rebalanceJobGroups reading the job-group store.
 */
final class AdminService(store: ParquetJobStore) {
  import AdminService._

  private val groups = TrieMap.empty[String, StoredGroup]
  store.loadGroups().foreach(g => groups.put(g.spec.jobGroupId, g))

  private def persist(): Unit = {
    store.saveGroups(groups.values.toSeq.sortBy(_.spec.jobGroupId)); ()
  }

  /** AddJobGroup: create-if-absent; an existing group wins (idempotent). */
  def add(doc: StoredGroup): StoredGroup = synchronized {
    groups.get(doc.spec.jobGroupId) match {
      case Some(existing) => existing
      case None => groups.put(doc.spec.jobGroupId, doc); persist(); doc
    }
  }

  /** UpdateJobGroup: replace spec+range, keep the stored state. */
  def update(doc: StoredGroup): Option[StoredGroup] = synchronized {
    groups.get(doc.spec.jobGroupId).map { old =>
      val merged = doc.copy(state = old.state)
      groups.put(doc.spec.jobGroupId, merged); persist(); merged
    }
  }

  /** UpdateJobGroupState: flip desired state only. */
  def updateState(id: String, state: String): Option[StoredGroup] = synchronized {
    require(JobStates.contains(state), s"unknown state '$state' (known: ${JobStates.mkString(", ")})")
    groups.get(id).map { old =>
      val next = old.copy(state = state)
      groups.put(id, next); persist(); next
    }
  }

  /** DeleteJobGroup. Returns false when the group was absent. */
  def delete(id: String): Boolean = synchronized {
    val removed = groups.remove(id).isDefined
    if (removed) persist()
    removed
  }

  def get(id: String): Option[StoredGroup] = groups.get(id)

  def all: Seq[StoredGroup] = groups.values.toSeq.sortBy(_.spec.jobGroupId)

  /** The rebalance tick's expected-set: RUNNING groups with live partition
    * counts (partition discovery is the caller's — KafkaSourceConfig). */
  def expected(partitionsOf: JobSpec => Int): Seq[(JobSpec, Int)] =
    all.filter(_.state == JobStateRunning).map(g => g.spec -> partitionsOf(g.spec))

  /** Scale map for the tick: CANCELED groups hibernate (scale 0) regardless
    * of the autoscaler's view; RUNNING groups defer to it. */
  def scaleOverrides(scaleOf: String => Double): Map[String, Double] =
    all.map(g => g.spec.jobGroupId ->
      (if (g.state == JobStateRunning) scaleOf(g.spec.jobGroupId) else 0.0)).toMap
}

object AdminService {

  /** StoredJobGroup analog: the admin document the store versions
    * (reference: job_group.proto StoredJobGroup — JobGroup + JobState;
    * the optional bounded range is the KafkaConsumerTaskGroup window). */
  final case class StoredGroup(
      spec: JobSpec,
      state: String = JobStateRunning,
      range: Option[GroupRange] = None)

  // JobState names mirrored from the reference enum (job.proto JobState).
  val JobStateRunning = "JOB_STATE_RUNNING"
  val JobStateCanceled = "JOB_STATE_CANCELED"
  val JobStateFailed = "JOB_STATE_FAILED"
  val JobStates: Set[String] = Set(JobStateRunning, JobStateCanceled, JobStateFailed)
}

/**
 * Wire codec for the admin surface: JSON <-> [[AdminService.StoredGroup]].
 * Field names are the [[JobSpec]] case-class names (which themselves mirror
 * job.proto / job_group.proto), so a document round-trips byte-stable
 * through parse → toJson → parse. Jackson's tree model does the parsing —
 * hand-rolled string parsing of untrusted HTTP bodies is how injection bugs
 * happen; the writer side builds nodes, never concatenates strings.
 *
 * Validation is the reference's validate-then-store: a document that parses
 * but is semantically invalid (empty ids, unknown job type, rpc-less
 * dispatcher job, inverted range) throws [[IllegalArgumentException]] with
 * a message naming the field — the HTTP layer maps it to 400.
 */
object JobGroupJson {
  import AdminService._

  private val mapper = new ObjectMapper()

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull)

  private def str(n: JsonNode, field: String, default: => Option[String] = None): String =
    opt(n, field) match {
      case Some(v) if v.isTextual => v.asText
      case Some(v) => fail(s"field '$field' must be a string, got ${v.getNodeType}")
      case None => default.getOrElse(fail(s"missing required field '$field'"))
    }

  private def reqStr(n: JsonNode, field: String): String = {
    val v = str(n, field)
    if (v.isEmpty) fail(s"field '$field' must be non-empty")
    v
  }

  private def lng(n: JsonNode, field: String, default: Long): Long =
    opt(n, field) match {
      case Some(v) if v.canConvertToLong => v.asLong
      case Some(v) => fail(s"field '$field' must be an integer, got ${v.getNodeType}")
      case None => default
    }

  private def dbl(n: JsonNode, field: String, default: Double): Double =
    opt(n, field) match {
      case Some(v) if v.isNumber => v.asDouble
      case Some(v) => fail(s"field '$field' must be a number, got ${v.getNodeType}")
      case None => default
    }

  private def bool(n: JsonNode, field: String, default: Boolean): Boolean =
    opt(n, field) match {
      case Some(v) if v.isBoolean => v.asBoolean
      case Some(v) => fail(s"field '$field' must be a boolean, got ${v.getNodeType}")
      case None => default
    }

  private def arr(n: JsonNode, field: String): Seq[JsonNode] =
    opt(n, field) match {
      case Some(v: ArrayNode) => v.elements().asScala.toSeq
      case Some(v) => fail(s"field '$field' must be an array, got ${v.getNodeType}")
      case None => Nil
    }

  // ---- parse ----

  def parseSpec(n: JsonNode): JobSpec = {
    // required identity fields first: an error should name the FIRST thing
    // the caller must fix, not a downstream consequence of the defaults
    val jobGroupId = reqStr(n, "jobGroupId")
    val cluster = reqStr(n, "cluster")
    val topic = reqStr(n, "topic")
    val consumerGroup = reqStr(n, "consumerGroup")
    val jobTypeName = str(n, "jobTypeName", Some(JobType.ConsumerToRpcDispatcher.name))
    val jobType = JobType.of(jobTypeName) // throws on unknown names
    val rpc = opt(n, "rpc").map { r =>
      RpcSpec(
        uri = str(r, "uri", Some("")),
        procedure = str(r, "procedure", Some("")),
        rpcTimeoutMs = lng(r, "rpcTimeoutMs", 1000L),
        maxRpcTimeouts = lng(r, "maxRpcTimeouts", 0L).toInt,
        dlqTopic = str(r, "dlqTopic", Some("")))
    }.getOrElse(RpcSpec("", ""))
    if (jobType == JobType.ConsumerToRpcDispatcher &&
        (rpc.uri.isEmpty || rpc.procedure.isEmpty))
      fail(s"${jobType.name} requires rpc.uri and rpc.procedure")
    val kafkaDispatch = opt(n, "kafkaDispatch").map { d =>
      DispatchTarget(
        cluster = reqStr(d, "cluster"),
        topic = reqStr(d, "topic"),
        partition = opt(d, "partition").map { p =>
          if (!p.canConvertToInt) fail("kafkaDispatch.partition must be an integer")
          p.asInt
        },
        dedupEnabled = bool(d, "dedupEnabled", default = false),
        isSecure = bool(d, "isSecure", default = false))
    }
    if ((jobType == JobType.Replication || jobType == JobType.LoadGen) && kafkaDispatch.isEmpty)
      fail(s"${jobType.name} requires kafkaDispatch")
    val tiers = arr(n, "retryTiers").map { t =>
      val tier = RetryTier(
        topic = reqStr(t, "topic"),
        processingDelayMs = lng(t, "processingDelayMs", 0L),
        maxRetryCount = lng(t, "maxRetryCount", 0L).toInt)
      if (tier.processingDelayMs < 0) fail("retryTiers.processingDelayMs must be >= 0")
      if (tier.maxRetryCount < 0) fail("retryTiers.maxRetryCount must be >= 0")
      tier
    }
    val fc = opt(n, "flowControl").map { f =>
      val parsed = FlowControl(
        messagesPerSec = dbl(f, "messagesPerSec", Double.MaxValue),
        bytesPerSec = dbl(f, "bytesPerSec", Double.MaxValue),
        maxInflightMessages = dbl(f, "maxInflightMessages", Double.MaxValue))
      if (parsed.messagesPerSec <= 0 || parsed.bytesPerSec <= 0 || parsed.maxInflightMessages <= 0)
        fail("flowControl quotas must be > 0")
      parsed
    }.getOrElse(FlowControl.unlimited)
    val security = opt(n, "security").map { s =>
      SecuritySpec(
        serviceIdentities = arr(s, "serviceIdentities").map { id =>
          if (!id.isTextual) fail("security.serviceIdentities must be strings")
          id.asText
        },
        isSecure = bool(s, "isSecure", default = false),
        multiTenancyEnabled = bool(s, "multiTenancyEnabled", default = false),
        clientOptions = opt(s, "clientOptions").map { co =>
          if (!co.isObject) fail("security.clientOptions must be an object")
          co.properties().asScala.map { e =>
            if (!e.getValue.isTextual) fail("security.clientOptions values must be strings")
            e.getKey -> e.getValue.asText
          }.toMap
        }.getOrElse(Map.empty))
    }.getOrElse(SecuritySpec())
    val delay = lng(n, "processingDelayMs", 0L)
    if (delay < 0) fail("processingDelayMs must be >= 0")
    JobSpec(
      jobGroupId = jobGroupId,
      cluster = cluster,
      topic = topic,
      consumerGroup = consumerGroup,
      rpc = rpc,
      retryEnabled = bool(n, "retryEnabled", default = false),
      retryTiers = tiers,
      resqTopic = str(n, "resqTopic", Some("")),
      flowControl = fc,
      processingDelayMs = delay,
      security = security,
      jobTypeName = jobTypeName,
      kafkaDispatch = kafkaDispatch)
  }

  def parseRange(n: JsonNode): GroupRange = {
    val ranges = arr(n, "partitionOffsetRanges").map { r =>
      val por = PartitionOffsetRange(
        partition = lng(r, "partition", -1L).toInt,
        startOffset = lng(r, "startOffset", -1L),
        endOffset = lng(r, "endOffset", -1L))
      if (por.partition < 0) fail("partitionOffsetRanges.partition must be >= 0")
      if (por.startOffset < 0 || por.endOffset < por.startOffset)
        fail("partitionOffsetRanges must satisfy 0 <= startOffset <= endOffset")
      por
    }
    val dups = ranges.groupBy(_.partition).collect { case (p, rs) if rs.size > 1 => p }
    if (dups.nonEmpty) fail(s"duplicate partition in partitionOffsetRanges: ${dups.mkString(",")}")
    val range = GroupRange(
      startTimestampMs = lng(n, "startTimestampMs", -1L),
      endTimestampMs = lng(n, "endTimestampMs", -1L),
      partitionOffsetRanges = ranges)
    if (ranges.isEmpty && range.startTimestampMs >= 0 && range.endTimestampMs >= 0 &&
        range.endTimestampMs < range.startTimestampMs)
      fail("range endTimestampMs must be >= startTimestampMs")
    range
  }

  /** Parse one admin document: `{"jobGroup": {...}, "jobGroupState"?: "...",
    * "range"?: {...}}` (the AddJobGroupRequest shape). A bare spec object —
    * no `jobGroup` wrapper — is accepted for curl ergonomics. */
  def parseDoc(body: String): StoredGroup = {
    val root = try mapper.readTree(body) catch {
      case e: Exception => fail(s"malformed JSON: ${e.getMessage}")
    }
    if (root == null || !root.isObject) fail("body must be a JSON object")
    val specNode = opt(root, "jobGroup").getOrElse(root)
    val state = str(root, "jobGroupState", Some(JobStateRunning))
    if (!JobStates.contains(state))
      fail(s"unknown jobGroupState '$state' (known: ${JobStates.mkString(", ")})")
    StoredGroup(
      spec = parseSpec(specNode),
      state = state,
      range = opt(root, "range").map(parseRange))
  }

  // ---- write ----

  private def rpcNode(r: RpcSpec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("uri", r.uri).put("procedure", r.procedure)
      .put("rpcTimeoutMs", r.rpcTimeoutMs).put("maxRpcTimeouts", r.maxRpcTimeouts)
      .put("dlqTopic", r.dlqTopic)
    o
  }

  def specNode(s: JobSpec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("jobGroupId", s.jobGroupId).put("cluster", s.cluster)
      .put("topic", s.topic).put("consumerGroup", s.consumerGroup)
    o.set[ObjectNode]("rpc", rpcNode(s.rpc))
    o.put("retryEnabled", s.retryEnabled)
    val tiers = mapper.createArrayNode()
    s.retryTiers.foreach { t =>
      tiers.add(mapper.createObjectNode()
        .put("topic", t.topic)
        .put("processingDelayMs", t.processingDelayMs)
        .put("maxRetryCount", t.maxRetryCount))
    }
    o.set[ObjectNode]("retryTiers", tiers)
    o.put("resqTopic", s.resqTopic)
    o.set[ObjectNode]("flowControl", mapper.createObjectNode()
      .put("messagesPerSec", s.flowControl.messagesPerSec)
      .put("bytesPerSec", s.flowControl.bytesPerSec)
      .put("maxInflightMessages", s.flowControl.maxInflightMessages))
    o.put("processingDelayMs", s.processingDelayMs)
    val sec = mapper.createObjectNode()
    val ids = mapper.createArrayNode()
    s.security.serviceIdentities.foreach(ids.add)
    sec.set[ObjectNode]("serviceIdentities", ids)
    sec.put("isSecure", s.security.isSecure)
    sec.put("multiTenancyEnabled", s.security.multiTenancyEnabled)
    val co = mapper.createObjectNode()
    s.security.clientOptions.toSeq.sortBy(_._1).foreach { case (k, v) => co.put(k, v) }
    sec.set[ObjectNode]("clientOptions", co)
    o.set[ObjectNode]("security", sec)
    o.put("jobTypeName", s.jobTypeName)
    s.kafkaDispatch.foreach { d =>
      val dn = mapper.createObjectNode()
      dn.put("cluster", d.cluster).put("topic", d.topic)
      d.partition.foreach(dn.put("partition", _))
      dn.put("dedupEnabled", d.dedupEnabled).put("isSecure", d.isSecure)
      o.set[ObjectNode]("kafkaDispatch", dn)
    }
    o
  }

  def docNode(g: StoredGroup): ObjectNode = {
    val o = mapper.createObjectNode()
    o.set[ObjectNode]("jobGroup", specNode(g.spec))
    o.put("jobGroupState", g.state)
    g.range.foreach { r =>
      val rn = mapper.createObjectNode()
      rn.put("startTimestampMs", r.startTimestampMs)
      rn.put("endTimestampMs", r.endTimestampMs)
      val pors = mapper.createArrayNode()
      r.partitionOffsetRanges.foreach { por =>
        pors.add(mapper.createObjectNode()
          .put("partition", por.partition)
          .put("startOffset", por.startOffset)
          .put("endOffset", por.endOffset))
      }
      rn.set[ObjectNode]("partitionOffsetRanges", pors)
      o.set[ObjectNode]("range", rn)
    }
    o
  }

  def toJson(g: StoredGroup): String = mapper.writeValueAsString(docNode(g))

  def toJson(gs: Seq[StoredGroup]): String = {
    val a = mapper.createArrayNode()
    gs.foreach(g => a.add(docNode(g)))
    mapper.writeValueAsString(a)
  }
}
