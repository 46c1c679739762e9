package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

import scala.collection.mutable

/** Top-k-per-group as a first-class operator.
  *
  * `row_number().over(partitionBy(g).orderBy(o)) <= k` is the idiomatic
  * Spark spelling, but WindowExec must shuffle and fully sort EVERY row of
  * every group before the filter drops all but k of them. At 100 TB that
  * sort dominates. This operator keeps a bounded k-heap per group on each
  * input partition (map-side), shuffles only the surviving candidate rows,
  * and assigns ranks with a streaming sort-based pass after the shuffle —
  * the ranking analogue of partial aggregation.
  *
  * Memory safety at high group cardinality (the 100 TB failure mode):
  *  - phase 1 caps the number of live heaps per partition at
  *    [[TopKLocalExec.MaxGroupsPerPartition]]; beyond it, the
  *    least-recently-started group's heap is FLUSHED downstream instead of
  *    growing the map. Flushing is loss-free: phase-1 output only needs to
  *    be a superset of each group's true top-k, and every true top-k row
  *    is top-k of whatever flush segment it falls in. Worst case (groups
  *    ~ rows) phase 1 degrades to a pass-through — exactly what the
  *    window formulation shuffles anyway.
  *  - phase 2 requires (group, orderSpec) sort order from Spark's
  *    EnsureRequirements — the external sort spills — and streams each
  *    group with O(k) state instead of holding a heap per group of the
  *    partition.
  *
  * Wired in via SparkSessionExtensions ([[GraftExtensions]]): an optimizer
  * rule rewrites the Filter-over-row_number-Window pattern (when the
  * window has that single expression) into [[TopKPerGroup]], and a
  * planner strategy lowers it to the two-phase exec pair. Semantics are
  * identical to the window formulation — including tie behavior, which is
  * deterministic exactly when the order spec is total.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Phase-1 kernel: streaming bounded selection. At most `maxGroups` live
  * k-heaps; when a new group arrives at the cap, the least-recently-started
  * heap is flushed to the output iterator (see memory-safety note above). */
private[graft] object TopKHeaps {
  def boundedTopK(
      iter: Iterator[InternalRow],
      groupProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      k: Int,
      maxGroups: Int): Iterator[InternalRow] = new Iterator[InternalRow] {
    private val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
    private val flushed = mutable.Queue.empty[InternalRow]
    private var tail: Iterator[InternalRow] = Iterator.empty
    private var drained = false

    private def fill(): Unit = {
      while (flushed.isEmpty && iter.hasNext) {
        val row = iter.next().copy()
        val key = groupProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < k) heap.enqueue(row)
            else if (ordering.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row) }
          case None =>
            if (heaps.size >= maxGroups) {
              val (_, oldHeap) = heaps.head
              heaps.remove(heaps.head._1)
              flushed ++= oldHeap
            }
            val heap = mutable.PriorityQueue.empty[InternalRow](ordering)
            heap.enqueue(row)
            heaps(key.copy()) = heap
        }
      }
      if (flushed.isEmpty && !iter.hasNext && !drained) {
        drained = true
        tail = heaps.valuesIterator.flatMap(_.iterator)
      }
    }

    override def hasNext: Boolean = { fill(); flushed.nonEmpty || tail.hasNext }
    override def next(): InternalRow = {
      fill()
      if (flushed.nonEmpty) flushed.dequeue() else tail.next()
    }
  }
}

/** Phase 1: per-input-partition bounded selection; emits candidate rows
  * (child schema, no rank yet). */
case class TopKLocalExec(
    groupExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] = Seq(UnspecifiedDistribution)

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsB = groupExprs
    val orderB = orderSpec
    val childOutput = child.output
    val kB = k
    val maxGroups = TopKLocalExec.MaxGroupsPerPartition
    child.execute().mapPartitions { iter =>
      val groupProj = GenerateUnsafeProjection.generate(groupExprsB, childOutput)
      val ordering = RowOrdering.create(orderB, childOutput)
      TopKHeaps.boundedTopK(iter, groupProj, ordering, kB, maxGroups)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKLocalExec =
    copy(child = newChild)
}

object TopKLocalExec {
  /** Live-heap cap per partition: bounds phase-1 memory at
    * cap × k rows (~tens of MB for typical k) regardless of group
    * cardinality. Low enough to be safe beside a 128 MB shuffle
    * partition, high enough that well-clustered inputs never flush. */
  val MaxGroupsPerPartition: Int = 1 << 16
}

/** Phase 2: after clustering by the group key AND sorting by
  * (group, orderSpec) — both enforced through EnsureRequirements, so the
  * sort is Spark's spill-capable external sort over the already-pruned
  * candidate set — stream each group and emit its first k rows with
  * their 1-based rank. O(k) state per group; nothing is held across
  * groups. */
case class TopKFinalExec(
    groupExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupExprs))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupExprs.map(e => SortOrder(e, Ascending)) ++ orderSpec)
  override def outputOrdering: Seq[SortOrder] =
    groupExprs.map(e => SortOrder(e, Ascending)) ++ orderSpec

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsB = groupExprs
    val childOutput = child.output
    val outputB = output
    val rankIsLong = rankAttr.dataType == LongType
    val kB = k
    child.execute().mapPartitions { iter =>
      val groupProj = GenerateUnsafeProjection.generate(groupExprsB, childOutput)
      val resultProj = GenerateUnsafeProjection.generate(
        outputB.map(a => BoundReference(outputB.indexOf(a), a.dataType, a.nullable)))
      val joiner = new JoinedRow
      var currentKey: InternalRow = null
      var seen = 0
      iter.flatMap { row =>
        val key = groupProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          seen = 0
        }
        seen += 1
        if (seen <= kB) {
          val rank: Any = if (rankIsLong) seen.toLong else seen
          Iterator.single(resultProj(joiner(row, InternalRow(rank))))
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}
