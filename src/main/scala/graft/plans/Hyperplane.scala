package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

object VectorKernels {
  /** Sign-pattern bucket of `emb` under `nPlanes` hyperplanes (row-major
    * flattened into `flat`). Per-plane dot accumulates left-to-right in
    * double — the same sequential fold the DuckDB verification oracle's
    * `list_sum(list_transform(...))` performs, so the sign (and thus the
    * bucket) is bit-deterministic across engines. */
  def hyperplaneBucket(emb: ArrayData, flat: Array[Double], nPlanes: Int,
                       isFloat: Boolean): Long = {
    val dim = flat.length / nPlanes
    val n = math.min(dim, emb.numElements())
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val off = p * dim
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) emb.getFloat(j).toDouble else emb.getDouble(j)
        dot += x * flat(off + j)
        j += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** array<float|double> embedding → 64-bit hyperplane sign bucket, as a
  * native codegen Expression. Replaces the interpreted zip_with+aggregate
  * per-plane fold (nPlanes allocated product arrays per row) with one
  * primitive loop — bucketing runs inside the scan stage, so a 100 TB
  * corpus can be bucket-partitioned in a single map pass. */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  private lazy val flat: Array[Double] = planes.flatten.toArray
  private def nPlanes: Int = planes.length
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects float/double array, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneBucket(input.asInstanceOf[ArrayData], flat, nPlanes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("planes", flat, "double[]")
      s"${ev.value} = graft.plans.VectorKernels.hyperplaneBucket($c, $ref, $nPlanes, $isFloat);"
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object Hyperplane {
  def bucket(emb: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(
      HyperplaneBucket(ColumnBridge.expression(emb), planes.map(_.toSeq).toSeq))
}
