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

  /** Equal-width bucket of long-valued `c` over [min, max] into 2^bits
    * buckets — 0-based, max falls in the last bucket. Equal-width is the
    * right transform for roughly-uniform keys (surrogate ids,
    * timestamps); a heavily skewed dimension wants a rank transform
    * upstream (the same caveat Delta documents for its z-order). */
  def bucket(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
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
              bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    val r = df.agg(
      min(col(a)).cast(LongType), max(col(a)).cast(LongType),
      min(col(b)).cast(LongType), max(col(b)).cast(LongType)).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      "z-order cluster() needs non-null dimension values")
    val z = zvalue(
      bucket(col(a), r.getLong(0), r.getLong(1), bits),
      bucket(col(b), r.getLong(2), r.getLong(3), bits))
    val withZ = df.withColumn("__z", z)
    val ranged =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions(col("__z")).drop("__z")
  }
}
