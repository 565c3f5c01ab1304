package graft.control

import scala.collection.immutable.TreeMap

/**
 * Deterministic job placement: consistent-hash ring with virtual nodes and
 * a load-aware adjustment pass.
 *
 * Mirrors the placement goals of the reference rebalancers
 * (reference: uforwarder/.../controller/rebalancer/RpcJobColocatingRebalancer.java:36-115,
 *  AbstractRpcUriRebalancer.java:55-140, RebalancerCommon.java): jobs of the
 * same group co-locate on few workers, placement is stable under worker
 * churn (consistent hashing moves only the affected arcs), and no worker
 * exceeds the mean load by more than the tolerance.
 *
 * Driver-side pure function — in the Spark re-expression the "workers" are
 * executor pools / streaming queries, and placement decides which query
 * handles which topic-partition set (SURVEY.md §2.7: small-cardinality
 * driver logic, not a distributed job).
 */
object Rebalancer {

  final case class JobKey(jobGroupId: String, partition: Int)
  final case class Placement(assignments: Map[JobKey, String]) {
    def workerOf(job: JobKey): Option[String] = assignments.get(job)
    def jobsOf(worker: String): Seq[JobKey] =
      assignments.collect { case (j, w) if w == worker => j }.toSeq.sortBy(j => (j.jobGroupId, j.partition))
  }

  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.foreach { c => h ^= c.toLong; h *= 0x100000001b3L }
    h
  }

  /** Build the virtual-node ring: each worker gets `vnodes` points. */
  private def ring(workers: Seq[String], vnodes: Int): TreeMap[Long, String] =
    TreeMap.from(for {
      w <- workers
      v <- 0 until vnodes
    } yield fnv1a(s"$w#$v") -> w)

  /** Consistent-hash placement with a load cap: a worker may hold at most
    * ceil(jobs/workers * (1+tolerance)) jobs; overflow walks the ring. */
  def place(
      jobs: Seq[JobKey],
      workers: Seq[String],
      vnodes: Int = 64,
      tolerance: Double = 0.25): Placement = {
    require(workers.nonEmpty, "no workers")
    val r = ring(workers, vnodes)
    val cap = math.max(1L, math.ceil(jobs.size.toDouble / workers.size * (1.0 + tolerance)).toLong)
    val loads = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    // deterministic order: sorted jobs so repeated runs agree
    val assignments = jobs.sortBy(j => (j.jobGroupId, j.partition)).map { j =>
      // jobs of one group hash by group id -> co-location on few workers
      val h = fnv1a(s"${j.jobGroupId}#${j.partition / 8}")
      val candidates = (r.iteratorFrom(h) ++ r.iterator).map(_._2)
      val w = candidates.find(loads(_) < cap).getOrElse(workers.head)
      loads(w) += 1
      j -> w
    }.toMap
    Placement(assignments)
  }

  /** Jobs that must move between two placements (stability metric). */
  def moved(before: Placement, after: Placement): Seq[JobKey] =
    after.assignments.collect {
      case (j, w) if before.assignments.get(j).exists(_ != w) => j
    }.toSeq.sortBy(j => (j.jobGroupId, j.partition))

  /** Hibernation: groups with zero scale get no workers at all
    * (reference: HibernatingJobRebalancer.java). */
  def placeWithScale(
      jobs: Seq[JobKey],
      scaleByGroup: Map[String, Double],
      workers: Seq[String]): Placement = {
    val active = jobs.filter(j => scaleByGroup.getOrElse(j.jobGroupId, 1.0) > 0.0)
    place(active, workers)
  }
}
