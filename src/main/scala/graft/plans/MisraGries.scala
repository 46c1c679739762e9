package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch: at most `k` counters summarize any
  * stream, with every item's true count over-counted by 0 and
  * under-counted by at most n/(k+1). The summaries are MERGEABLE with
  * the same bound (Agarwal et al., "Mergeable Summaries", PODS'12):
  * pointwise-add two summaries, then subtract the (k+1)-th largest
  * counter from all and drop the non-positive — so the aggregate runs as
  * a normal map-side-partial Spark aggregation over any partitioning.
  *
  * The guarantee that matters downstream: an item with true count
  * > n/(k+1) can NEVER be evicted to zero — no false negatives above
  * that support. That makes the sketch a candidate generator: recount
  * the ≤ k candidates exactly (a second, map-side-filtered pass) and the
  * final heavy-hitter set is EXACT and partitioning-independent, while
  * memory stays O(k) regardless of vocabulary size — the 100 TB
  * replacement for a full groupBy over an unbounded token domain.
  */
object MGKernel {

  type Buf = java.util.HashMap[String, Long]

  def update(buf: Buf, item: String, k: Int): Unit = {
    val cur = buf.get(item)
    if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + 1L)
    else if (buf.size < k) buf.put(item, 1L)
    else {
      // decrement-all: amortized O(1) — each decrement pays for an insert
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Pointwise add, then trim back to k by subtracting the (k+1)-th
    * largest count (the mergeable-summaries recipe). */
  def merge(a: Buf, b: Buf, k: Int): Buf = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > k) {
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(a.size - k - 1) // (k+1)-th largest
      val eit = a.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue - sub <= 0L) eit.remove() else e.setValue(e.getValue - sub)
      }
    }
    a
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }
}

/** string items → array<struct<item string, count_lb bigint>> (sorted by
  * count desc, item asc — deterministic for a GIVEN summary; the summary
  * itself depends on partition order, which is why exact recounting of
  * the candidates is the deterministic consumption pattern). */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGKernel.Buf] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_lb", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects string items, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): MGKernel.Buf = new MGKernel.Buf()

  override def update(buffer: MGKernel.Buf, input: InternalRow): MGKernel.Buf = {
    val v = child.eval(input)
    if (v != null) MGKernel.update(buffer, v.asInstanceOf[UTF8String].toString, k)
    buffer
  }

  override def merge(buffer: MGKernel.Buf, other: MGKernel.Buf): MGKernel.Buf =
    MGKernel.merge(buffer, other, k)

  override def eval(buffer: MGKernel.Buf): Any = {
    val entries = new Array[(String, Long)](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(buffer: MGKernel.Buf): Array[Byte] = MGKernel.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): MGKernel.Buf = MGKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Aggregate Column: MG sketch of `items` with `k` counters. */
  def sketch(items: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(items), k).toAggregateExpression())
}
