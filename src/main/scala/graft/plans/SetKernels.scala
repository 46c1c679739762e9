package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Set-intersection kernel for the exact similarity joins.
  *
  * `array_intersect` builds a per-row hash set of one side's elements
  * (alloc + string hashing for every candidate pair) — measured as the
  * whole cost of AllPairs verification at ~880k candidates (73 s of a
  * 75 s stage at sf0.1's sampled minhash audit). Over arrays that are
  * SORTED in the same order, intersection is a two-pointer MERGE: zero
  * allocation, binary UTF8 comparisons only, O(|a|+|b|). Verification
  * sides sort their token arrays once per SET row (array_sort, binary
  * string order — the merge's comparator exactly) before the candidate
  * fan-out, so the per-pair work is the merge alone.
  */
object SetKernelOps {

  /** |a ∩ b| over two string arrays sorted ascending in UTF8 binary
    * order. Duplicate-free inputs assumed (token SETS); duplicated or
    * unsorted inputs return wrong counts silently — the Column wrapper
    * scaladoc states the contract. Null elements are REJECTED loudly
    * (r16 ADVICE): string-array types usually carry containsNull=true
    * whatever the data, so the type-check can't see it, and a bare
    * getUTF8String on a null slot would NPE with no hint of cause. */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val ua = a.getUTF8String(i)
      val ub = b.getUTF8String(j)
      if ((ua eq null) || (ub eq null))
        throw new IllegalArgumentException(
          "sorted_intersect_size: null array element — inputs must be " +
          "null-free sorted token sets (see SetKernels scaladoc)")
      val cmp = ua.compareTo(ub)
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** [[sortedIntersectLongs]] with null checks on VISITED slots — the
    * variant the expression compiles in when an INPUT TYPE is
    * nullable (e.g. arrays read back from parquet: Spark marks all
    * file-read columns nullable even when the writer's type was not).
    * getLong on a null slot reads garbage silently, so each visited
    * slot is isNullAt-checked before its read and throws loudly;
    * containsNull=false inputs keep the zero-check fast path. The
    * check rides the merge's own walk (r16: a first cut pre-scanned
    * BOTH full arrays per call — measured as a multiple of the whole
    * triangle-lane cost at sf1, because the merge visits each pair of
    * adjacency arrays once per EDGE). */
  def sortedIntersectLongsChecked(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val buf = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_intersect_longs: null array element — inputs must be " +
          "null-free sorted sets (see SetKernels scaladoc)")
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { buf(c) = x; c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(buf, c))
  }

  /** a ∩ b (values) over two long arrays sorted ascending. */
  def sortedIntersectLongs(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val buf = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { buf(c) = x; c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(buf, c))
  }
}

/** size(a ∩ b) for UTF8-sorted string arrays — see [[SetKernelOps]]. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects two array<string>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernelOps.sortedIntersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SetKernelOps.sortedIntersectSize($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** a ∩ b (values) over two long arrays sorted ascending — the
  * edge-iterator triangle plan's inner loop: for an oriented edge
  * (u, v), the common out-neighbors N⁺(u) ∩ N⁺(v) are exactly the
  * third vertices of the triangles this edge closes, and over SORTED
  * adjacency arrays the intersection is a primitive two-pointer merge
  * (no hash set, no allocation beyond the result). */
case class SortedIntersectLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect_longs"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_longs expects two array<bigint>, got $other")
    }

  // null-slot safety decided from the STATIC type (r16 ADVICE): getLong
  // on a null slot reads garbage silently, so nullable-typed inputs
  // (every parquet-read array — Spark marks all file-read columns
  // nullable) compile in a pre-scan that throws loudly on a null slot;
  // containsNull=false producers (sort_array ∘ collect_list) keep the
  // zero-check fast path. The choice is per-plan, not per-row.
  private def needsNullScan: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
  }
  private def kernel: String =
    if (needsNullScan) "sortedIntersectLongsChecked" else "sortedIntersectLongs"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (needsNullScan)
      SetKernelOps.sortedIntersectLongsChecked(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SetKernelOps.sortedIntersectLongs(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SetKernelOps.$kernel($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectLongs =
    copy(left = newLeft, right = newRight)
}

object SetKernels {
  /** Column wrapper: size(a ∩ b) for UTF8-sorted string arrays.
    *
    * PRECONDITION (caller contract, not checked per row): both arrays
    * must be DISTINCT elements sorted ascending in UTF8 binary order
    * (`array_sort` over a set — the AllPairs shape). Unsorted or
    * duplicated input silently under/over-counts vs array_intersect's
    * set semantics. Null ELEMENTS throw IllegalArgumentException at
    * eval (string array types carry containsNull=true regardless of
    * data, so this can't be a type check). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: a ∩ b (values) for ascending long arrays.
    *
    * PRECONDITION (caller contract, not checked per row): both arrays
    * must be DISTINCT longs sorted ascending (sort_array ∘
    * collect_list — the Triangles adjacency shape); unsorted or
    * duplicated input silently returns wrong intersections. Null
    * ELEMENTS throw at eval; the check compiles in only when an input
    * TYPE is nullable (parquet-read arrays) — containsNull=false
    * producers keep the zero-check fast path. */
  def sortedIntersectLongs(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectLongs(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
