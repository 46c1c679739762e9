package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native signature expressions for the dedup family.
  *
  * Both are row-local single-pass primitive loops exposed to whole-stage
  * codegen through a static kernel (one virtual call per row, no
  * per-element boxing). They replace interpreted higher-order-function
  * pipelines: MinHash was 64 nested lambda folds per row; SimHash was an
  * explode → 64-accumulator hash aggregate (a full shuffle of every
  * token). At 100 TB neither shuffle nor per-token interpretation is
  * acceptable; these keep signature computation entirely inside the scan
  * stage.
  */
object SignatureKernels {

  /** MinHash signature of pre-hashed shingles: slot i is
    * min over h of (A_i * h + B_i) with odd multipliers (bijections mod
    * 2^64 — Java arithmetic wraps, which is exactly the ring we want).
    * Constants derive from splitmix64 so slots are independent. */
  def minhash(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = splitmix64(2L * i + 1) | 1L
      val b = splitmix64(0x9E3779B97F4A7C15L + i)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = a * hashes.getLong(j) + b
        if (v < min) min = v
        j += 1
      }
      out(i) = if (n == 0) 0L else min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of a token array: xxh64 each token's bytes, vote ±1
    * per bit, take sign bits. */
  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val t = tokens.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      j += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit SimHash with MD5-derived token hashes: the first 8 digest
    * bytes, read big-endian as two unsigned 32-bit halves, vote ±1 on
    * bits 0-31 (low half) and 32-63 (high half). MD5-on-UTF-8 is the one
    * token hash every engine computes identically (`md5()` is a standard
    * SQL function), so unlike the xxh64 [[simhash]] this fingerprint is
    * reproducible bit-for-bit outside the JVM — it exists so cross-engine
    * oracles can verify simhash dedup output value-by-value, and for
    * pipelines that must re-derive the same signatures elsewhere. ~2-3×
    * the per-token cost of xxh64; same banding, same recall. */
  def simhashMd5(tokens: ArrayData): Long = {
    val md = md5Local.get()
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      md.reset()
      val d = md.digest(tokens.getUTF8String(j).getBytes)
      val c0 = ((d(0) & 0xFF) << 24) | ((d(1) & 0xFF) << 16) | ((d(2) & 0xFF) << 8) | (d(3) & 0xFF)
      val c1 = ((d(4) & 0xFF) << 24) | ((d(5) & 0xFF) << 16) | ((d(6) & 0xFF) << 8) | (d(7) & 0xFF)
      var k = 0
      while (k < 32) {
        if (((c0 >>> k) & 1) == 1) votes(k) += 1 else votes(k) -= 1
        if (((c1 >>> k) & 1) == 1) votes(32 + k) += 1 else votes(32 + k) -= 1
        k += 1
      }
      j += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Distinct char n-gram hashes of a string, SORTED ascending — one
    * UTF-8 walk records codepoint byte offsets, then each shingle hashes
    * its byte range directly (no per-gram string materializes, no O(len²)
    * substring walking). Sorted output turns downstream set ops
    * (jaccardSortedLongs) into linear merges. */
  def charShingleHashesSorted(t: UTF8String, n: Int): ArrayData = {
    val bytes = t.numBytes()
    val base = t.getBaseObject
    val off = t.getBaseOffset
    // codepoint start offsets (byte positions), +1 sentinel at end
    val starts = new Array[Int](t.numChars() + 1)
    var i = 0; var c = 0
    while (i < bytes) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(org.apache.spark.unsafe.Platform.getByte(base, off + i))
      c += 1
    }
    starts(c) = bytes
    val m = math.max(c - n + 1, 0)
    val seen = new java.util.HashSet[java.lang.Long]()
    val buf = new Array[Long](m)
    var k = 0
    i = 0
    while (i < m) {
      val b0 = starts(i)
      val h = XXH64.hashUnsafeBytes(base, off + b0, starts(i + n) - b0, 42L)
      if (seen.add(h)) { buf(k) = h; k += 1 }
      i += 1
    }
    val out = java.util.Arrays.copyOf(buf, k)
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Jaccard of two SORTED distinct long arrays via a linear merge. */
  def jaccardSortedLongs(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  /** All unordered pairs of an id array, as (min, max) structs — the
    * LSH bucket-local candidate expansion. A primitive double loop
    * replaces the nested higher-order `transform` formulation, whose
    * per-element closure interpretation and ~KB of generated code per
    * branch dominated both steady-state time and first-use JIT. */
  def idPairs(idArr: ArrayData): ArrayData = {
    val n = idArr.numElements()
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = idArr.getLong(i); i += 1 }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = ids(i); val b = ids(j)
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](math.min(a, b), math.max(a, b)))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All unordered pairs of (doc_id, sig) structs with the pair's hamming
    * distance — the simhash bucket-local expansion (xor + bitCount inline,
    * so no per-pair bit_count expression downstream). */
  def simhashPairArray(ms: ArrayData): ArrayData = {
    val n = ms.numElements()
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = ms.getStruct(i, 2)
      ids(i) = r.getLong(0); sigs(i) = r.getLong(1)
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = ids(i); val b = ids(j)
        val ham = java.lang.Long.bitCount(sigs(i) ^ sigs(j)).toLong
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](math.min(a, b), math.max(a, b), ham))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct hashes of word k-shingles, without materializing shingle
    * strings: hash each token's bytes once, then mix k consecutive token
    * hashes per window. Dedup via a HashSet (shingle SETS, matching
    * array_distinct semantics). Output order is first-occurrence order —
    * deterministic for a given token sequence. */
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
      i += 1
    }
    val m = math.max(n - k + 1, 0)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < m) {
      var h = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < k) {
        h = splitmix64(h ^ th(i + j))
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** array<long> shingle hashes → array<long> MinHash signature. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.minhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SignatureKernels.minhash($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** array<string> tokens → array<long> distinct word-k-shingle hashes. */
case class ShingleHash(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.shingleHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SignatureKernels.shingleHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

/** array<string> tokens → 64-bit SimHash fingerprint. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SignatureKernels.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** array<string> tokens → 64-bit SimHash with MD5 token hashes — the
  * cross-engine-reproducible variant (see SignatureKernels.simhashMd5). */
case class SimHashMd5_64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64_md5 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.simhashMd5(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SignatureKernels.simhashMd5($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5_64 =
    copy(child = newChild)
}

/** string → sorted distinct char n-gram hashes (array<bigint>). */
case class CharShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingle_hashes expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.charShingleHashesSorted(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SignatureKernels.charShingleHashesSorted($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

/** (sorted array<bigint>, sorted array<bigint>) → jaccard (double). */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted expects two array<bigint>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SignatureKernels.jaccardSortedLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SignatureKernels.jaccardSortedLongs($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** array<bigint> ids → array<struct<id_a,id_b>> of all unordered pairs. */
case class IdPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "id_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"id_pairs expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.idPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SignatureKernels.idPairs($c);")

  override protected def withNewChildInternal(newChild: Expression): IdPairs =
    copy(child = newChild)
}

/** array<struct<bigint,bigint>> (id, simhash) → array<struct<id_a,id_b,
  * hamming>> of all unordered pairs with hamming distance. */
case class SimhashPairArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("hamming", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "simhash_pair_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_pair_array expects array<struct<bigint,bigint>>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.simhashPairArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SignatureKernels.simhashPairArray($c);")

  override protected def withNewChildInternal(newChild: Expression): SimhashPairArray =
    copy(child = newChild)
}

object Signatures {
  def minhashSig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), numHashes))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def simhash64Md5(tokens: Column): Column =
    ColumnBridge.column(SimHashMd5_64(ColumnBridge.expression(tokens)))

  def shingleHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(tokens), k))

  def idPairs(ids: Column): Column =
    ColumnBridge.column(IdPairs(ColumnBridge.expression(ids)))

  def charShingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(CharShingleHashes(ColumnBridge.expression(text), n))

  def jaccardSorted(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSorted(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhashPairArray(ms: Column): Column =
    ColumnBridge.column(SimhashPairArray(ColumnBridge.expression(ms)))
}
