package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Blocked bloom filter over 64-bit key hashes.
  *
  * The build side aggregates its keys into a bit array (partial
  * aggregation merges by OR, so the build is map-side parallel); the
  * probe side tests membership with a codegen expression. k index
  * positions derive from one 64-bit hash by double hashing
  * (h1 + i·h2 — Kirsch–Mitzenmacher), so the scan computes exactly one
  * hash per row.
  *
  * Bits are sized by the caller: false-positive rate ≈
  * (1 - e^(-k·n/m))^k; the default 4 MiB / 5 hashes holds ~2×10^6 keys
  * at <1% fp. False positives only cost wasted shuffle rows — the exact
  * join downstream removes them — so output is EXACTLY the plain join's.
  */
object BloomKernels {

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def add(bits: Array[Long], hash: Long, numHashes: Int): Unit = {
    val numBits = bits.length.toLong * 64
    val h2 = mix(hash) | 1L
    var i = 0
    var h = hash
    while (i < numHashes) {
      val idx = (h & Long.MaxValue) % numBits
      bits((idx >>> 6).toInt) |= (1L << (idx & 63))
      i += 1
      h += h2
    }
  }

  def mightContain(bytes: Array[Byte], hash: Long, numHashes: Int): Boolean = {
    val numBits = bytes.length.toLong * 8
    val h2 = mix(hash) | 1L
    var i = 0
    var h = hash
    while (i < numHashes) {
      val idx = (h & Long.MaxValue) % numBits
      val b = bytes((idx >>> 3).toInt)
      if (((b >>> (idx & 7).toInt) & 1) == 0) return false
      i += 1
      h += h2
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(bits)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }
}

/** bigint key hashes → bloom bit array (binary). Partial aggregation
  * merges by OR — the build is a map-side-combining hash aggregate. */
case class BloomBuildAgg(
    child: Expression,
    numBits: Long = 1L << 25,
    numHashes: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_build expects bigint (pre-hashed keys), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long]((numBits / 64).toInt)

  override def update(buffer: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomKernels.add(buffer, v.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomKernels.toBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = BloomKernels.toBytes(buffer)
  override def deserialize(storageFormat: Array[Byte]): Array[Long] =
    BloomKernels.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)
}

/** (bloom binary, bigint key hash) → boolean membership test. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int = 5)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override def nullSafeEval(bloom: Any, hash: Any): Any =
    BloomKernels.mightContain(bloom.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.plans.BloomKernels.mightContain($b, $h, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Membership test against a DRIVER-HELD bloom (built once, shipped with
  * the task binary via a plan reference, not a printed literal). Using a
  * plain predicate — instead of a cross join against a one-row bloom
  * DataFrame — keeps the filter glued to the probe scan: Catalyst's join
  * reorder would otherwise hoist a join-shaped bloom ABOVE the exact
  * join it is meant to pre-filter. */
case class BloomProbe(bloom: Array[Byte], child: Expression, numHashes: Int = 5)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"
  override def toString: String = s"bloom_probe(${bloom.length.toLong * 8} bits, $child)"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects bigint (pre-hashed key), got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BloomKernels.mightContain(bloom, input.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val ref = ctx.addReferenceObj("bloomBits", bloom, "byte[]")
      s"${ev.value} = graft.plans.BloomKernels.mightContain($ref, $h, $numHashes);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object Bloom {
  def build(keyHash: Column, numBits: Long = 1L << 25, numHashes: Int = 5): Column =
    ColumnBridge.column(
      BloomBuildAgg(ColumnBridge.expression(keyHash), numBits, numHashes)
        .toAggregateExpression())

  def mightContain(bloom: Column, keyHash: Column, numHashes: Int = 5): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(keyHash), numHashes))

  def probe(bloomBytes: Array[Byte], keyHash: Column, numHashes: Int = 5): Column =
    ColumnBridge.column(BloomProbe(bloomBytes, ColumnBridge.expression(keyHash), numHashes))
}
