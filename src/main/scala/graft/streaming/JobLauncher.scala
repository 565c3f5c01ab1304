package graft.streaming

import graft.model.{JobSpec, JobType}
import graft.streaming.ForwardingEngine.KafkaRecord
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Type-dispatched job launch — the analog of the reference worker's
 * `PipelineFactoryImpl.createPipeline` deciding what a Job RUNS based on
 * its JobType (reference: uforwarder/.../worker/PipelineFactoryImpl.java:
 * 68-133; job types job.proto:339-356). One entry point turns a JobSpec
 * into the right running StreamingQuery:
 *
 *  - CONSUMER_TO_RPC_DISPATCHER → the full forwarding engine;
 *  - AUDIT → windowed count + approx-uniq audit of the stream, written to
 *    the job's `kafkaDispatch` topic as JSON records (the Uatu-feed shape);
 *  - REPLICATION → queue→queue copy with the cross-cluster loop guard;
 *  - LOAD_GEN → rate-source producer at `flowControl.messagesPerSec`;
 *  - AVAILABILITY → the NATIVE_PRODUCER probe (a low-rate load-gen into
 *    the probe topic; the consumer-side evaluation is
 *    [[QueueJobs.probeStats]] / q105).
 */
object JobLauncher {

  final case class Deps(
      dispatcherFactory: DispatcherFactory = null,
      store: QueueStore = null,
      committer: Option[OffsetCommitter] = None,
      sinkFormat: String = "graft-queue")

  def launch(
      spark: SparkSession,
      spec: JobSpec,
      stream: Option[Dataset[KafkaRecord]],
      checkpointDir: String,
      deps: Deps = Deps()): StreamingQuery = spec.jobType match {

    case JobType.ConsumerToRpcDispatcher =>
      ForwardingEngine.run(spec, deps.dispatcherFactory, spec.cluster,
        stream.getOrElse(sys.error("forwarding job requires a source stream")),
        deps.store, checkpointDir, spec.jobGroupId, committer = deps.committer)

    case JobType.Replication =>
      QueueJobs.runReplication(
        stream.getOrElse(sys.error("replication job requires a source stream")),
        spec.cluster,
        spec.kafkaDispatch.getOrElse(sys.error("replication job requires kafkaDispatch")),
        checkpointDir, spec.jobGroupId, format = deps.sinkFormat)

    case JobType.LoadGen | JobType.Availability =>
      // AVAILABILITY's producer half IS a low-rate load-gen into the probe
      // topic (AvailabilityJobType NATIVE_PRODUCER); the rate comes from
      // the job's flow control either way
      val rate = math.max(1L, math.min(spec.flowControl.messagesPerSec, 1e9).toLong)
      QueueJobs.runLoadGen(spark, rate, payloadBytes = 64,
        spec.kafkaDispatch.getOrElse(sys.error(s"${spec.jobTypeName} job requires kafkaDispatch")),
        checkpointDir, spec.jobGroupId, format = deps.sinkFormat)

    case JobType.Audit =>
      // windowed audit records produced to the dispatch topic as JSON —
      // the "audit feed" consumable by an SLA monitor
      val src = stream.getOrElse(sys.error("audit job requires a source stream"))
      val target = spec.kafkaDispatch.getOrElse(sys.error("audit job requires kafkaDispatch"))
      AuditStream.windowedAudit(
          src.withColumn("ts", timestamp_micros(expr("timestampNs DIV 1000"))),
          "ts", "1 minute", "1 minute")
        .select(
          lit(target.topic).as("topic"),
          encode(concat_ws("|", col("topic"), col("window_start").cast("string")), "UTF-8").as("key"),
          encode(to_json(struct(col("window_start"), col("topic").as("audited_topic"),
            col("n"), col("approx_uniq"))), "UTF-8").as("value"))
        .writeStream
        .queryName(spec.jobGroupId)
        .format(deps.sinkFormat)
        .option("checkpointLocation", checkpointDir)
        .start()
  }
}
