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

  /** One job moved by the load-balancing phase: (job, fromWorker, toWorker). */
  final case class Move(job: JobKey, from: String, to: String)

  /**
   * Load-aware adjustment phase: after ring placement, move jobs OFF workers
   * whose observed load exceeds the fleet mean by `tolerance`, onto the
   * least-loaded worker that can absorb them — the reference's step-4
   * workload adjustment (reference: RpcJobColocatingRebalancer.java:88-120
   * `ensureWorkersLoadBalanced` + `adjustJobsOnWorker`:320-378 +
   * `canMoveWorkloadToWorker`:385-398 + `isWorkerUnderLoadLimit`:400-404).
   *
   * Contract mirrored from the reference:
   *  - a worker holding a single job is never adjusted (a job is atomic);
   *  - an overloaded worker sheds its SMALLEST jobs first (the reference
   *    walks the sorted job list from the light end so each move is minimal);
   *  - a target must stay under the hard limit after the move — or be empty
   *    (an empty worker may take any single job, however heavy);
   *  - when no target can absorb a job, the donor stays overloaded (logged
   *    as unadjusted in the reference) rather than overloading others.
   *
   * Only overloaded workers donate and each donated job moves exactly once,
   * so the phase is minimal by construction: every job NOT on an overloaded
   * worker keeps its ring placement (stability), unlike a re-hash which
   * would reshuffle arcs fleet-wide. `loadOf` is the observed per-job
   * workload signal (q80's per-key load / the autoscaler scale split across
   * the group's partitions), NOT the job count the ring capped on.
   */
  def balanceLoad(
      placement: Placement,
      loadOf: JobKey => Double,
      workers: Seq[String],
      tolerance: Double = 0.25): (Placement, Seq[Move]) = {
    require(workers.nonEmpty, "no workers")
    val assigned = scala.collection.mutable.Map.empty[String, Vector[JobKey]]
      .withDefaultValue(Vector.empty)
    placement.assignments.foreach { case (j, w) => assigned(w) = assigned(w) :+ j }
    val load = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    workers.foreach(w => load(w) = assigned(w).map(loadOf).sum)
    // mean over the WHOLE fleet (idle workers pull the target down — they
    // are exactly the headroom the move phase exists to use)
    val mean = workers.map(load).sum / workers.size
    val hardLimit = mean * (1.0 + tolerance)
    if (hardLimit <= 0.0) return (placement, Seq.empty)

    val moves = scala.collection.mutable.ArrayBuffer.empty[Move]
    // most-loaded worker first (the reference iterates its sorted table from
    // the heavy end); deterministic tie-break on the worker id
    val donors = workers.sortBy(w => (-load(w), w))
    donors.foreach { donor =>
      // smallest jobs first — each move is the lightest that helps
      var jobs = assigned(donor).sortBy(j => (loadOf(j), j.jobGroupId, j.partition))
      while (load(donor) > hardLimit && jobs.size > 1) {
        val candidate = jobs.head
        val jl = loadOf(candidate)
        // least-loaded worker that can absorb it; empty workers accept any
        val target = workers
          .filter(w => w != donor &&
            (load(w) + jl <= hardLimit || assigned(w).isEmpty))
          .sortBy(w => (load(w), w))
          .headOption
        target match {
          case Some(t) =>
            assigned(donor) = assigned(donor).filterNot(_ == candidate)
            assigned(t) = assigned(t) :+ candidate
            load(donor) -= jl
            load(t) += jl
            moves += Move(candidate, donor, t)
            jobs = jobs.tail
          case None =>
            // nothing can take even the smallest job — every heavier job is
            // harder to place; stop rather than overload a peer
            jobs = Vector(jobs.last)
        }
      }
    }
    val adjusted = placement.assignments ++ moves.map(m => m.job -> m.to)
    (Placement(adjusted), moves.toSeq)
  }

  /** Ring placement + hibernation + the load-aware move phase in one call:
    * per-job load = the group's observed scale split evenly across its
    * partition-jobs (the reference's scalePerJobInPod,
    * RpcJobColocatingRebalancer.java:163-165). */
  def placeBalanced(
      jobs: Seq[JobKey],
      scaleByGroup: Map[String, Double],
      workers: Seq[String],
      tolerance: Double = 0.25): (Placement, Seq[Move]) = {
    val base = placeWithScale(jobs, scaleByGroup, workers)
    val partsOf = jobs.groupBy(_.jobGroupId).view.mapValues(_.size.toDouble).toMap
    val loadOf = (j: JobKey) =>
      scaleByGroup.getOrElse(j.jobGroupId, 1.0) / math.max(partsOf.getOrElse(j.jobGroupId, 1.0), 1.0)
    balanceLoad(base, loadOf, workers, tolerance)
  }
}
