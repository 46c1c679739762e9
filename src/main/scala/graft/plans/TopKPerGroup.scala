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
  * input partition (map-side), shuffles only the surviving ≤ k×groups
  * candidate rows, and repeats the bounded selection after the shuffle —
  * the ranking analogue of partial aggregation.
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

/** Shared kernel: consume rows, keep a bounded max-heap of the top-k rows
  * per group key (heap root = currently-worst retained row). */
private[plans] object TopKHeaps {
  def topKByGroup(
      iter: Iterator[InternalRow],
      groupProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      k: Int): Iterator[(InternalRow, mutable.PriorityQueue[InternalRow])] = {
    val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
    while (iter.hasNext) {
      val row = iter.next().copy()
      val key = groupProj(row)
      val heap = heaps.getOrElseUpdate(key.copy(),
        mutable.PriorityQueue.empty[InternalRow](ordering))
      if (heap.size < k) heap.enqueue(row)
      else if (ordering.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row) }
    }
    heaps.iterator
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
    child.execute().mapPartitions { iter =>
      val groupProj = GenerateUnsafeProjection.generate(groupExprsB, childOutput)
      val ordering = RowOrdering.create(orderB, childOutput)
      TopKHeaps.topKByGroup(iter, groupProj, ordering, kB)
        .flatMap { case (_, heap) => heap.iterator }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKLocalExec =
    copy(child = newChild)
}

/** Phase 2: after clustering by the group key, final bounded selection +
  * rank assignment (1-based, in order-spec order). */
case class TopKFinalExec(
    groupExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsB = groupExprs
    val orderB = orderSpec
    val childOutput = child.output
    val outputB = output
    val rankIsLong = rankAttr.dataType == LongType
    val kB = k
    child.execute().mapPartitions { iter =>
      val groupProj = GenerateUnsafeProjection.generate(groupExprsB, childOutput)
      val ordering = RowOrdering.create(orderB, childOutput)
      val resultProj = GenerateUnsafeProjection.generate(
        outputB.map(a => BoundReference(outputB.indexOf(a), a.dataType, a.nullable)))
      val joiner = new JoinedRow
      TopKHeaps.topKByGroup(iter, groupProj, ordering, kB).flatMap { case (_, heap) =>
        val sorted = heap.dequeueAll.reverse // ascending in order spec
        sorted.iterator.zipWithIndex.map { case (row, i) =>
          val rank: Any = if (rankIsLong) (i + 1).toLong else i + 1
          resultProj(joiner(row, InternalRow(rank))).copy()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}
