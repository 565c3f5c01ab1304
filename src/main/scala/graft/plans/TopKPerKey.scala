package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.SparkSessionExtensions

/**
 * Per-key top-k as a first-class operator:
 * `TopKPerKey(k, keys, order)` keeps, for every distinct key, the first k
 * rows in `order`, and emits them with their 1-based rank appended.
 *
 * Why a custom operator: the composable formulation —
 * `row_number().over(Window.partitionBy(keys).orderBy(order))` + `rn <= k` —
 * shuffles EVERY row to the key's reducer and sorts full partitions before
 * discarding all but k rows. This operator plans like partial aggregation:
 * a map-side phase keeps at most k rows per key per input partition (bounded
 * heaps), so the exchange moves ≤ k·keys·maps rows instead of the whole
 * input, then a final phase merges. At 100 TB with k=10 this is the
 * difference between shuffling terabytes and shuffling megabytes.
 *
 * Memory bound: each task holds k rows per DISTINCT KEY in its partition,
 * capped at `spark.graft.topk.maxKeysPerTask` keys (default 4M). Beyond the
 * cap the operator degrades instead of OOMing: the map-side phase passes
 * overflow-key rows through unpruned (pruning is only an optimization
 * there), and the final phase routes overflow-key rows into a SPILLABLE
 * external sort keyed by (keys, order) and stream-groups the sorted run —
 * exactly the window operator's sort-based plan, applied only to the keys
 * that exceeded the hash budget. Keys never migrate between the two paths
 * (a key enters the map on first sight or never), so each path computes an
 * exact per-key top-k over all of that key's rows.
 *
 * Wired via [[GraftExtensions]]: an optimizer rule rewrites the
 * Filter(row_number ≤ k over Window) pattern automatically, so the
 * user-facing DataFrame code stays the idiomatic window expression.
 */
case class TopKPerKeyNode(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/**
 * Physical per-key top-k. `partial = true` runs map-side with no required
 * distribution (pruning only — emits no ranks); the final phase requires
 * clustering on the keys and emits ranks.
 */
case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Option[Attribute],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (keys.isEmpty) Seq(org.apache.spark.sql.catalyst.plans.physical.AllTuples)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    val emitRank = rankAttr.isDefined && !partial
    val isPartial = partial
    val maxKeys = conf.getConfString(TopKPerKeyExec.MaxKeysConf, "4194304").toInt
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = RowOrdering.create(orderExprs, childOutput)
      def emit(r: InternalRow, rank: Int): InternalRow =
        if (!emitRank) r
        else {
          val joined = new GenericInternalRow(childOutput.size + 1)
          var c = 0
          while (c < childOutput.size) {
            joined.update(c, r.get(c, childOutput(c).dataType)); c += 1
          }
          joined.update(childOutput.size, rank.toLong)
          joined
        }
      // per-key bounded "heap": k is small — an insertion-sorted array beats
      // a real heap on constant factors and preserves deterministic order
      val heaps = new java.util.HashMap[UnsafeRow, java.util.ArrayList[InternalRow]]()
      // Overflow path (final phase only), created lazily on the first key
      // past the cap: a spillable external sort on (keys, order); the sorted
      // run stream-groups into per-key top-k. Overflow keys are exactly the
      // keys NOT in the map, so the two paths partition the key space.
      var sorter: org.apache.spark.sql.execution.UnsafeExternalRowSorter = null
      lazy val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      def overflowSorter() = {
        if (sorter == null) {
          val schema = org.apache.spark.sql.types.StructType(
            childOutput.map(a => org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
          val fullOrder = keyExprs.map(e => SortOrder(e, Ascending)) ++ orderExprs
          val sortOrdering = RowOrdering.create(fullOrder, childOutput)
          val prefixComputer = new org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer {
            private val p = new org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer.Prefix
            override def computePrefix(row: InternalRow) = { p.value = 0L; p.isNull = false; p }
          }
          sorter = org.apache.spark.sql.execution.UnsafeExternalRowSorter.create(
            schema, sortOrdering,
            org.apache.spark.util.collection.unsafe.sort.PrefixComparators.LONG,
            prefixComputer,
            org.apache.spark.sql.graft.Shims.taskPageSizeBytes(),
            false)
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => if (sorter != null) sorter.cleanupResources()))
        }
        sorter
      }
      def heapsIterator: Iterator[InternalRow] = {
        import scala.jdk.CollectionConverters._
        // stream straight out of the heaps map — buffering the output would
        // hold a second full copy of k×keys rows next to the heaps
        heaps.values().iterator().asScala.flatMap { heap =>
          (0 until heap.size).iterator.map(i => emit(heap.get(i), i + 1))
        }
      }
      def sortedOverflowIterator: Iterator[InternalRow] =
        if (sorter == null) Iterator.empty
        else {
          var curKey: UnsafeRow = null
          var rankInKey = 0
          sorter.sort().flatMap { row =>
            val key = keyProj(row)
            if (curKey == null || key != curKey) { curKey = key.copy(); rankInKey = 0 }
            rankInKey += 1
            if (rankInKey <= kLocal) Iterator.single(emit(row, rankInKey)) else Iterator.empty
          }
        }
      // Streaming driver loop: consumes input, prunes map-resident keys in
      // place, and (partial phase) passes overflow rows straight through —
      // the operator's own memory stays bounded by maxKeys × k rows.
      new Iterator[InternalRow] {
        private var pending: InternalRow = null
        private var tail: Iterator[InternalRow] = null
        private def advance(): Unit = {
          while (pending == null && tail == null) {
            if (!rows.hasNext) {
              tail = heapsIterator ++ sortedOverflowIterator
            } else {
              val row = rows.next()
              val key = keyProj(row)
              var heap = heaps.get(key)
              if (heap == null && heaps.size >= maxKeys) {
                // key budget exhausted: degrade instead of growing the map
                if (isPartial) pending = row // unpruned pass-through is correct
                else overflowSorter().insertRow(toUnsafe(row))
              } else {
                if (heap == null) {
                  heap = new java.util.ArrayList[InternalRow](kLocal + 1)
                  heaps.put(key.copy(), heap)
                }
                if (heap.size < kLocal || ordering.compare(row, heap.get(heap.size - 1)) < 0) {
                  val copied = row.copy()
                  var i = heap.size
                  heap.add(copied) // placeholder slot
                  while (i > 0 && ordering.compare(copied, heap.get(i - 1)) < 0) {
                    heap.set(i, heap.get(i - 1)); i -= 1
                  }
                  heap.set(i, copied)
                  if (heap.size > kLocal) heap.remove(kLocal)
                }
              }
            }
          }
        }
        override def hasNext: Boolean = { advance(); pending != null || tail.hasNext }
        override def next(): InternalRow = {
          advance()
          if (pending != null) { val r = pending; pending = null; r } else tail.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "GraftTopKPerKey(partial)" else "GraftTopKPerKey(final)"
}

object TopKPerKeyExec {
  /** Max distinct keys a single task holds in the hash phase before
    * degrading to pass-through (partial) / spillable sort (final). */
  val MaxKeysConf = "spark.graft.topk.maxKeysPerTask"
}

/**
 * Optimizer rule: Filter(rn <= k) over Window(row_number over (partition by
 * keys order by o)) becomes the TopKPerKey operator. Conservative match:
 * the window must contain exactly the row_number expression and the filter
 * must bound it by a literal.
 */
object RewriteWindowTopK extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ LWindow(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(partitionSpec, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _)) =>
      extractBound(cond, alias.toAttribute) match {
        case Some(k) if k > 0 && k <= 1000000 =>
          // Spark's own InferWindowGroupLimit may already have inserted
          // WindowGroupLimit nodes below the Window — our operator subsumes
          // them (and skips the final sort they still require), so strip them
          val strippedChild = child.transformUp {
            case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit => wgl.child
          }
          // rank is long in our exec; row_number is int — keep the original
          // attribute via a cast projection for exact schema compatibility
          val rankLong = AttributeReference(alias.name + "_graft_rank",
            org.apache.spark.sql.types.LongType, nullable = false)()
          val topk = TopKPerKeyNode(k, partitionSpec, orderSpec, rankLong, strippedChild)
          org.apache.spark.sql.catalyst.plans.logical.Project(
            child.output :+ Alias(
              Cast(rankLong, org.apache.spark.sql.types.IntegerType),
              alias.name)(alias.exprId),
            topk)
        case _ => f
      }
  }

  /** Match rn <= k / rn < k / k >= rn forms against the rank attribute.
    * rn = 1 (the per-key argmin every Lloyd assignment uses) is top-1:
    * row_number starts at 1, so the equality and the bound coincide —
    * but ONLY for 1 (rn = k for k > 1 selects exactly rank k, not top-k). */
  private def extractBound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rn) => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, _), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }
}

/** Plans the logical node as partial -> (exchange via distribution) -> final
  * — the same shape partial aggregation uses. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, rank, child) =>
      val partialPhase = TopKPerKeyExec(k, keys, order, None, partial = true, planLater(child))
      TopKPerKeyExec(k, keys, order, Some(rank), partial = false, partialPhase) :: Nil
    case _ => Nil
  }
}
