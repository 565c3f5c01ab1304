package graft.control

import graft.model.{GroupRange, JobSpec}

/**
 * Materializes a time/offset-ranged job GROUP into per-partition bounded
 * jobs — the reference's batch-job creation path
 * (reference: uforwarder-core/.../controller/creator/BatchJobCreator.java:117-260):
 *
 *  - explicit `partitionOffsetRanges` win over timestamps, and ONLY the
 *    listed partitions are consumed (job_group.proto:111-115);
 *  - otherwise every live partition resolves [start, end) from the group's
 *    timestamps via the offsetsForTimes contract, with the reference's
 *    fallback ladder: an end timestamp past the log tail falls back to the
 *    high watermark; a start timestamp past the tail falls back to the
 *    resolved END offset (an empty range — nothing to consume), never to
 *    earliest (BatchJobCreator.java:218-260 getOffset fallbacks).
 *
 * Offset resolution is behind [[OffsetResolver]] so the same creator runs
 * against the in-process broker (tests) or a Kafka AdminClient binding
 * (production) — the creator owns only the RANGE ALGEBRA.
 */
object BatchJobCreator {

  /** The three admin-client reads the creator needs (beginningOffsets /
    * endOffsets / offsetsForTimes). */
  trait OffsetResolver {
    def partitions(topic: String): Seq[Int]
    def beginningOffset(topic: String, partition: Int): Long
    def endOffset(topic: String, partition: Int): Long
    /** First offset with record timestamp >= tsMs; None past the tail. */
    def offsetForTime(topic: String, partition: Int, tsMs: Long): Option[Long]
  }

  /** [[OffsetResolver]] over the in-process broker. */
  object BrokerResolver extends OffsetResolver {
    import graft.sources.GraftBroker
    def partitions(topic: String): Seq[Int] = {
      // a typo'd topic must fail loudly, not auto-create a phantom
      // 1-partition topic and "succeed" with an empty bounded job
      require(GraftBroker.topicExists(topic),
        s"topic '$topic' does not exist on the broker")
      0 until GraftBroker.partitionsOf(topic)
    }
    def beginningOffset(topic: String, partition: Int): Long = 0L
    def endOffset(topic: String, partition: Int): Long =
      GraftBroker.endOffsets(topic)(partition)
    def offsetForTime(topic: String, partition: Int, tsMs: Long): Option[Long] =
      GraftBroker.offsetForTime(topic, partition, tsMs)
  }

  /** One per-partition bounded job (the Job the reference's creator stores
    * per partition; start==end is the legal empty/purge range). */
  final case class BoundedJob(
      spec: JobSpec,
      partition: Int,
      startOffset: Long,
      endOffset: Long)

  /** Materialize the group's jobs. Empty ranges (start==end) are kept —
    * they still carry commit semantics (the purge path). */
  def createJobs(spec: JobSpec, range: GroupRange, resolver: OffsetResolver): Seq[BoundedJob] = {
    require(range.isBounded,
      s"group ${spec.jobGroupId} has no timestamps and no offset ranges — not a bounded group")
    if (range.partitionOffsetRanges.nonEmpty) {
      // one range per partition: duplicates would make createJobs (a job
      // per range) and toBounds (a map per partition) silently diverge
      val dup = range.partitionOffsetRanges.groupBy(_.partition).collect {
        case (p, rs) if rs.size > 1 => p
      }
      require(dup.isEmpty,
        s"duplicate partition(s) ${dup.toSeq.sorted.mkString(",")} in " +
          s"partitionOffsetRanges for group ${spec.jobGroupId}")
      range.partitionOffsetRanges.map { r =>
        require(r.startOffset >= 0 && r.endOffset >= r.startOffset,
          s"invalid offset range [${r.startOffset}, ${r.endOffset}) for " +
            s"${spec.topic}-${r.partition}")
        BoundedJob(spec, r.partition, r.startOffset, r.endOffset)
      }
    } else {
      // assertValidTimestamps (BatchJobCreator.java:262-275): start may be
      // 0 ("from the beginning of retention"), end must be after start
      require(range.startTimestampMs >= 0 && range.endTimestampMs >= range.startTimestampMs,
        s"invalid timestamps [${range.startTimestampMs}, ${range.endTimestampMs}) " +
          s"for group ${spec.jobGroupId}")
      resolver.partitions(spec.topic).sorted.map { p =>
        val end = resolver.offsetForTime(spec.topic, p, range.endTimestampMs)
          .getOrElse(resolver.endOffset(spec.topic, p)) // high-watermark fallback
        val start = resolver.offsetForTime(spec.topic, p, range.startTimestampMs)
          .getOrElse(end) // start past the tail -> empty range, never earliest
        // assertValidOffsets: resolution must never produce a reversed range
        require(start <= end,
          s"resolved reversed range [$start, $end) for ${spec.topic}-$p")
        BoundedJob(spec, p, start, end)
      }
    }
  }

  /** The jobs' ranges as the per-partition maps the bounded batch read
    * takes (QueueJobs.runDlqBounded / KafkaSourceConfig.boundedReadOptions). */
  def toBounds(jobs: Seq[BoundedJob]): (Map[Int, Long], Map[Int, Long]) =
    (jobs.map(j => j.partition -> j.startOffset).toMap,
      jobs.map(j => j.partition -> j.endOffset).toMap)
}
