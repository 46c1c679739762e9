package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

object IvfKernels {
  /** The `nProbe` nearest coarse-quantizer cells for `emb`, by descending
    * dot product against the (pre-normalized) centroids in `flat`
    * (row-major, `nCells` × dim). With unit centroids, dot ranking equals
    * cosine ranking — the query's own norm is constant across cells.
    * Ties break toward the lower cell id. O(nCells × nProbe) selection:
    * both are small constants (≤ a few hundred / ≤ 8). */
  def probeCells(emb: ArrayData, flat: Array[Double], nCells: Int,
                 nProbe: Int, isFloat: Boolean): ArrayData = {
    val dim = flat.length / nCells
    val n = math.min(dim, emb.numElements())
    val dots = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      val off = c * dim
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) emb.getFloat(j).toDouble else emb.getDouble(j)
        dot += x * flat(off + j)
        j += 1
      }
      dots(c) = dot
      c += 1
    }
    val k = math.min(nProbe, nCells)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nCells)
    var p = 0
    while (p < k) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var i = 0
      while (i < nCells) {
        if (!taken(i) && dots(i) > bestDot) { best = i; bestDot = dots(i) }
        i += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** array<float|double> embedding → the `nProbe` nearest IVF cells as
  * array<int>, as a native codegen Expression. Cell assignment runs inside
  * the scan stage (one primitive loop per row), so a 100 TB corpus is
  * cell-partitioned in a single map pass — the IVF "inverted file" is just
  * the corpus hash-partitioned (or partitioned-by on write) on
  * `element_at(cells, 1)`. */
case class IvfProbeCells(child: Expression, centroids: Seq[Seq[Double]],
                         nProbe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe_cells"

  private lazy val flat: Array[Double] = centroids.flatten.toArray
  private def nCells: Int = centroids.length
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_probe_cells expects float/double array, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    IvfKernels.probeCells(input.asInstanceOf[ArrayData], flat, nCells, nProbe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("centroids", flat, "double[]")
      s"${ev.value} = graft.plans.IvfKernels.probeCells($c, $ref, $nCells, $nProbe, $isFloat);"
    })

  override protected def withNewChildInternal(newChild: Expression): IvfProbeCells =
    copy(child = newChild)
}

object Ivf {
  def probeCells(emb: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(
      IvfProbeCells(ColumnBridge.expression(emb), centroids.map(_.toSeq).toSeq, nProbe))
}
