package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 64×64 Gram-matrix aggregate over embedding rows (r18, guide §1.2
  * "per-task work" + §2.3 "aggregate before you shuffle").
  *
  * Replaces q_pca_power's 4096-cell-per-row posexplode → 8.2M-row hash
  * aggregation: per input row the old shape allocated two nested
  * `transform` arrays (4096 boxed longs), generated 4096 exploded rows,
  * and pushed each through the hash-agg path — ~6 s at sf0.1 PER
  * REFERENCE of the covariance subtree (and the power-iteration lane
  * references it five times). This aggregate does the same arithmetic
  * as a tight primitive loop in one pass per reference: 4096
  * multiply-accumulates per row into a long[4096] partition buffer,
  * merged pointwise — cells per task, never cells per row, cross the
  * aggregation boundary.
  *
  * EXACTNESS CONTRACT (oracle-pinned, PcaGramSpec): cell (i,j) of the
  * result is bit-identical to the SQL it replaces —
  *   sum over rows of CAST(floor(CAST(e[i+1] AS DOUBLE)
  *                              * CAST(e[j+1] AS DOUBLE)
  *                              * 1000000000.0 + 0.5) AS BIGINT)
  * with SQL null semantics: a null/short/absent element makes that
  * row's (i,j) contribution NULL (skipped by sum, tracked so an
  * all-null cell evals to NULL, exactly like sum()); `n` counts EVERY
  * input row, null embeddings included, exactly like count(1) over the
  * old posexplode (which emitted 4096 cells per row regardless).
  * Multiplication is IEEE double both sides: float widens exactly,
  * (xi*xj)*1e9+0.5 associates left like the SQL, floor then long-cast
  * saturates like Catalyst's double→bigint cast.
  */
object GramKernel {
  final val Dim = 64
  final val Cells = Dim * Dim

  final class Buf {
    val sums = new Array[Long](Cells)
    val cnt = new Array[Long](Cells)
    var n: Long = 0L
  }

  def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + Cells * 16)
    bb.putLong(b.n)
    var i = 0
    while (i < Cells) { bb.putLong(b.sums(i)); i += 1 }
    i = 0
    while (i < Cells) { bb.putLong(b.cnt(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Buf
    b.n = bb.getLong()
    var i = 0
    while (i < Cells) { b.sums(i) = bb.getLong(); i += 1 }
    i = 0
    while (i < Cells) { b.cnt(i) = bb.getLong(); i += 1 }
    b
  }
}

/** array<float|double|decimal> embeddings →
  * struct<sums: array<bigint> (4096, null where no non-null product),
  *        n: bigint (input row count)>. */
case class GramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramKernel.Buf] {

  import GramKernel.{Buf, Cells, Dim}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = true), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "gram64"

  // lazy: the analyzer copies this node (withNewChildrenInternal)
  // while the child is still unresolved, and dataType would throw
  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType | _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"gram64 expects array<float|double|decimal>, got ${child.dataType.simpleString}")
  }

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buffer: Buf, input: InternalRow): Buf = {
    buffer.n += 1L
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val len = math.min(arr.numElements(), Dim)
      val x = new Array[Double](Dim)
      val ok = new Array[Boolean](Dim)
      var i = 0
      while (i < len) {
        if (!arr.isNullAt(i)) {
          ok(i) = true
          x(i) = elemType match {
            case FloatType => arr.getFloat(i).toDouble
            case DoubleType => arr.getDouble(i)
            case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
            case _ => 0.0
          }
        }
        i += 1
      }
      i = 0
      while (i < Dim) {
        if (ok(i)) {
          val xi = x(i)
          val base = i * Dim
          var j = 0
          while (j < Dim) {
            if (ok(j)) {
              // (xi*xj)*1e9 + 0.5, floor, cast — associates and rounds
              // exactly like the SQL expression this replaces
              val p = math.floor(xi * x(j) * 1000000000.0 + 0.5)
              buffer.sums(base + j) += p.toLong
              buffer.cnt(base + j) += 1L
            }
            j += 1
          }
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Buf, other: Buf): Buf = {
    buffer.n += other.n
    var i = 0
    while (i < Cells) {
      buffer.sums(i) += other.sums(i)
      buffer.cnt(i) += other.cnt(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Buf): Any = {
    val out = new Array[Any](Cells)
    var i = 0
    while (i < Cells) {
      out(i) = if (buffer.cnt(i) > 0L) java.lang.Long.valueOf(buffer.sums(i))
               else null
      i += 1
    }
    InternalRow(new GenericArrayData(out), buffer.n)
  }

  override def serialize(buffer: Buf): Array[Byte] = GramKernel.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): Buf = GramKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}

object Gram {
  /** Aggregate Column: 64×64 Gram sums + row count of `embedding`. */
  def sums64(embedding: Column): Column =
    ColumnBridge.column(
      GramAgg(ColumnBridge.expression(embedding)).toAggregateExpression())
}
