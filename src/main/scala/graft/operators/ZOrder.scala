package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) multi-dimensional clustering — the lakehouse
  * layout answer to "we filter on user AND on time but can only sort the
  * data one way" (Delta's OPTIMIZE ZORDER BY, Iceberg's z-curve sort
  * orders — same recipe): interleave the bits of both dimensions into one
  * sort key whose contiguous ranges are axis-aligned rectangles, then
  * range-partition and sort the write by that key. Every output file's
  * parquet min/max footer is then narrow in EVERY dimension, so a
  * predicate on either one skips most row groups at scan time; a
  * single-key sort gives that property for the sort key only.
  *
  * Scale shape: the z-value is five mask-shift rounds per dimension of
  * plain Column bit arithmetic — whole-stage codegen inside the scan
  * stage, no UDF. [[cluster]]'s only driver-side work is one 4-long
  * min/max aggregate (the stats a table format hands out for free); the
  * data path is the one repartitionByRange shuffle ANY globally-sorted
  * write already pays, so z-ordering 100 TB costs the same as sorting it.
  *
  * Reference analogue: none — the reference ETL writes plain partition
  * directories (raw_to_conformed.py's year/month/day injection); z-order
  * is part of the beyond-reference 100 TB layout surface.
  */
object ZOrder {

  /** Exact integer division. Spark's `Column./` is double division —
    * inexact past 2^53, and bucket boundaries must be exact (the SQL
    * oracle floor-divides in full integer precision). */
  private def intDiv(a: Column, b: Column): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Spread the low 16 bits of bucket id `c` to the even bit positions —
    * the classic O(1) Morton mask-shift ladder. */
  def spread16(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two bucket ids in [0, 2^16): `a` on even bits, `b` on
    * odd — consecutive z-values trace the 2-D Z curve over (a, b) space. */
  def zvalue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Spread the low 21 bits of `c` to every third bit position — the
    * 3-D ladder (stride-3 masks, 21×3 = 63 bits). */
  def spread21(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0x1FFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val m4 = m3.bitwiseOR(shiftleft(m3, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    m4.bitwiseOR(shiftleft(m4, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Morton code of three bucket ids in [0, 2^21) — Delta's
    * `ZORDER BY a, b, c` shape (21 bits per dimension, 63 bits total;
    * `a` on bits 0,3,6…, `b` offset 1, `c` offset 2). */
  def zvalue3(a: Column, b: Column, c: Column): Column =
    spread21(a)
      .bitwiseOR(shiftleft(spread21(b), 1))
      .bitwiseOR(shiftleft(spread21(c), 2))

  /** Equal-width bucket of long-valued `c` over [min, max] into 2^bits
    * buckets — 0-based, max falls in the last bucket. Equal-width is the
    * right transform for roughly-uniform keys (surrogate ids,
    * timestamps); a heavily skewed dimension wants a rank transform
    * upstream (the same caveat Delta documents for its z-order). */
  def bucket(c: Column, min: Long, max: Long, bits: Int): Column = {
    // 16 is the 2-dim interleave width, 21 the 3-dim one; clusterBy
    // enforces the per-arity cap, this guard only stops overflow
    require(bits >= 1 && bits <= 21, s"bits must be in [1,21], got $bits")
    val n = 1L << bits
    val range = max - min + 1
    require(range > 0, s"empty bucket range [$min, $max]")
    require(range <= Long.MaxValue / n,
      s"range $range x $n buckets overflows 64-bit bucket math")
    intDiv((c.cast(LongType) - lit(min)) * lit(n), lit(range))
  }

  /** The z-clustered layout: rows of `df` range-partitioned (into
    * `numPartitions` output splits when > 0, else Spark's default) and
    * sorted by the interleaved key of the two long-valued dimension
    * columns. Write the result with any sink and each file covers a
    * near-rectangle of (a, b) space — ZOrderSpec pins the locality
    * guarantee (every partition's secondary-dimension extent shrinks vs a
    * primary-key sort), which is exactly what row-group min/max pruning
    * needs. */
  def cluster(df: DataFrame, a: String, b: String,
              bits: Int = 16, numPartitions: Int = 0): DataFrame =
    clusterBy(df, Seq(a, b), bits, numPartitions)

  /** N-dimension form (2 or 3 dims — the shapes the 64-bit key fits):
    * one stats agg over all dims, one interleaved key, one range
    * shuffle. 3-dim keys use the stride-3 ladder at up to 21 bits per
    * dimension. */
  def clusterBy(df: DataFrame, dims: Seq[String],
                bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    require(dims.size == 2 || dims.size == 3,
      s"z-order supports 2 or 3 dimensions, got ${dims.size}")
    val maxBits = if (dims.size == 2) 16 else 21
    require(bits >= 1 && bits <= maxBits,
      s"bits must be in [1,$maxBits] for ${dims.size} dims, got $bits")
    val statCols = dims.flatMap(d =>
      Seq(min(col(d)).cast(LongType), max(col(d)).cast(LongType)))
    val r = df.agg(statCols.head, statCols.tail: _*).head()
    val bucketed = dims.zipWithIndex.map { case (d, i) =>
      require(!r.isNullAt(2 * i), s"z-order cluster() needs non-null $d")
      bucket(col(d), r.getLong(2 * i), r.getLong(2 * i + 1), bits)
    }
    val z = bucketed match {
      case Seq(ba, bb) => zvalue(ba, bb)
      case Seq(ba, bb, bc) => zvalue3(ba, bb, bc)
    }
    val withZ = df.withColumn("__z", z)
    val ranged =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions(col("__z")).drop("__z")
  }
}
