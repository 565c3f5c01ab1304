package graft

import graft.model._
import graft.streaming._
import graft.streaming.ForwardingEngine.{KafkaRecord, Outcome}
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

/** The full uForwarder shape in STREAMING mode: one StreamingQuery per
  * consumable topic (main + retry tier), managed by JobManager, with
  * produced retry/DLQ records feeding back into the tier topics' streams —
  * scenario 2 of the reference integration suite as live streams rather
  * than batch stepping. */
object FeedbackQueueStore extends QueueStore {
  // topic -> MemoryStream acting as that topic (wired by the test)
  @volatile var sinks: Map[String, org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KafkaRecord]] = Map.empty
  val offsets = new TrieMap[String, AtomicLong]()
  val unrouted = new TrieMap[String, Vector[KafkaRecord]]() // topics with no query (e.g. DLQ)

  def produce(outcomes: Dataset[Outcome]): Unit = {
    outcomes.collect().filter(_.destination.nonEmpty).foreach { o =>
      val off = offsets.getOrElseUpdate(o.destination, new AtomicLong(0L)).getAndIncrement()
      val rec = KafkaRecord(o.outKey, o.outValue, o.destination, 0, off,
        System.currentTimeMillis() * 1000000L, Map.empty)
      sinks.get(o.destination) match {
        case Some(ms) => ms.addData(Seq(rec))
        case None =>
          unrouted.updateWith(o.destination) {
            case Some(v) => Some(v :+ rec)
            case None => Some(Vector(rec))
          }
      }
    }
  }
  def reset(): Unit = { sinks = Map.empty; offsets.clear(); unrouted.clear() }
}

class StreamingWorldSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def memStream() =
    org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KafkaRecord](
      implicitly[Encoder[KafkaRecord]], spark.sqlContext)

  test("live multi-query pipeline: main + retry tier streams escalate to DLQ") {
    val topic = "test-topic"; val group = "test-group"
    val tier1 = TopicNames.retry(topic, group, 1)
    val dlq = TopicNames.dlq(topic, group)
    val spec = JobSpec(
      jobGroupId = s"${topic}__$group", cluster = "local", topic = topic,
      consumerGroup = group,
      rpc = RpcSpec("grpc://consumer", s"kafka.consumerproxy.$group/$topic",
        dlqTopic = dlq),
      retryEnabled = true,
      retryTiers = Seq(RetryTier(tier1, 0L, 1))) // zero delay: visible at once

    TestConsumer.reset()
    FeedbackQueueStore.reset()
    TestConsumer.behaviors += "world" -> (_ => DispatchResult("RESOURCE_EXHAUSTED", None, overdue = false))

    val mainStream = memStream()
    val tierStream = memStream()
    FeedbackQueueStore.sinks = Map(tier1 -> tierStream)

    val jm = new graft.control.JobManager(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("world-ckpt").toString
    val qMain = jm.run(spec, MockDispatcherFactory("world"), "local",
      mainStream.toDS(), FeedbackQueueStore, ckpt)
    val qTier = jm.run(spec.copy(jobGroupId = s"${tier1}__$group"),
      MockDispatcherFactory("world"), "local",
      tierStream.toDS(), FeedbackQueueStore, ckpt)

    mainStream.addData(Seq(
      KafkaRecord("k1".getBytes, "msg-1".getBytes, topic, 0, 0L, 0L, Map.empty),
      KafkaRecord("k2".getBytes, "msg-2".getBytes, topic, 0, 1L, 0L, Map.empty)))

    // drain the cascade: main -> tier1 -> dlq
    qMain.processAllAvailable()
    qTier.processAllAvailable()
    qTier.processAllAvailable() // pick up anything the first pass produced
    jm.stopAll()

    // each message delivered from the main topic AND the retry tier (>=2x)
    assert(TestConsumer.count("world", "msg-1") >= 2)
    assert(TestConsumer.count("world", "msg-2") >= 2)
    // the consumer always sees the LOGICAL topic in its metadata, even for
    // deliveries fetched from the tier topic (identity preservation)
    import scala.jdk.CollectionConverters._
    val topicsSeen = TestConsumer.invocations.keySet.asScala
      .filter(k => k.startsWith("world|msg-1|")).map(_.split('|').last)
    assert(topicsSeen == Set(topic))
    // tier-1 nacks overflowed to the DLQ with fully-wrapped metadata
    val dlqRecs = FeedbackQueueStore.unrouted.getOrElse(dlq, Vector.empty)
    assert(dlqRecs.size == 2)
    val meta = DlqMetadata.decode(dlqRecs.head.key).get
    assert(meta.topic == topic)
    assert(meta.retryCount == 2L) // main->tier (1), tier->dlq (2)
    assert(new String(meta.data, "UTF-8").startsWith("k"))
  }
}
