package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ZOrder vs the definition: the Morton interleave checked bit-by-bit
  * against a reference Scala loop, bucket boundaries checked against exact
  * integer math, and the point of the whole exercise — the locality
  * guarantee — pinned by comparing per-partition bounding boxes of a
  * z-clustered grid against a primary-key-sorted one. */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  /** Reference interleave: bit i of a to bit 2i, bit i of b to 2i+1. */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zvalue matches the reference bit interleave over random 16-bit pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(1000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L), (1L, 2L))
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", ZOrder.zvalue($"a", $"b").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1)),
        s"interleave mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  /** Reference 3-D interleave: bit i of each dim to bits 3i, 3i+1, 3i+2. */
  private def morton3Ref(a: Long, b: Long, c: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((a >> i) & 1L) << (3 * i)
      z |= ((b >> i) & 1L) << (3 * i + 1)
      z |= ((c >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    z
  }

  test("zvalue3 matches the reference 3-D interleave over random 21-bit triples") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val top = (1L << 21) - 1
    val triples = Seq.fill(1000)(
      (rnd.nextInt(1 << 21).toLong, rnd.nextInt(1 << 21).toLong,
        rnd.nextInt(1 << 21).toLong)) ++
      Seq((0L, 0L, 0L), (top, 0L, 0L), (0L, top, 0L), (0L, 0L, top),
        (top, top, top))
    val got = triples.toDF("a", "b", "c")
      .select($"a", $"b", $"c", ZOrder.zvalue3($"a", $"b", $"c").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) == morton3Ref(r.getLong(0), r.getLong(1), r.getLong(2)),
        s"3-D interleave mismatch at (${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)})")
    }
  }

  test("3-D curve: aligned contiguous z-blocks are exact sub-cubes") {
    import spark.implicits._
    // the property pruning rests on, pinned deterministically (Spark's
    // repartitionByRange draws SAMPLED boundaries, so its splits can
    // straddle octants — the curve itself never does): chunking the 16^3
    // grid's z order into 8 aligned 512-cell blocks must yield 8x8x8
    // cubes, narrow in EVERY dim, where an a-sorted chunking leaves b and
    // c full-width
    val grid = for (a <- 0 until 16; b <- 0 until 16; c <- 0 until 16)
      yield (a.toLong, b.toLong, c.toLong)
    val withZ = grid.toDF("a", "b", "c")
      .select($"a", $"b", $"c", ZOrder.zvalue3($"a", $"b", $"c").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    withZ.sortBy(_._4).grouped(512).foreach { block =>
      Seq[((Long, Long, Long, Long)) => Long](_._1, _._2, _._3).zipWithIndex
        .foreach { case (dim, i) =>
          val ext = block.map(dim).max - block.map(dim).min
          assert(ext == 7L,
            s"dim $i extent $ext: an aligned 512-cell z-block must be an 8-cube")
        }
    }
    val bFull = withZ.sortBy(_._1).grouped(512).map(b =>
      b.map(_._2).max - b.map(_._2).min).max
    assert(bFull == 15L, "a-sorted chunking leaves b full-width")
  }

  test("clusterBy with 3 dims preserves rows and keeps mean extents narrow") {
    import spark.implicits._
    val grid = for (a <- 0 until 16; b <- 0 until 16; c <- 0 until 16)
      yield (a.toLong, b.toLong, c.toLong)
    val laid = ZOrder.clusterBy(grid.toDF("a", "b", "c"), Seq("a", "b", "c"),
      bits = 4, numPartitions = 8)
    val got = laid.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq == grid.sorted, "3-dim clustering must not drop rows")
    // sampled range boundaries may straddle an octant (full-width extent
    // in ONE partition), so pin the MEAN: mostly-cubes average well under
    // the 1-D layout's full-width 15 in dims b and c
    val boxes = laid.withColumn("pid", spark_partition_id())
      .groupBy($"pid")
      .agg((max($"a") - min($"a")).as("ea"), (max($"b") - min($"b")).as("eb"),
        (max($"c") - min($"c")).as("ec"))
      .collect()
    Seq(1, 2, 3).foreach { i =>
      val mean = boxes.map(_.getLong(i)).sum.toDouble / boxes.length
      assert(mean <= 12.0,
        s"dim $i mean extent $mean: z-clustered splits must stay mostly cubic")
    }
  }

  test("bucket boundaries are exact integer floor division, max in last bucket") {
    import spark.implicits._
    // a range deliberately NOT divisible by the bucket count, plus huge
    // offsets past 2^53 where double division would round wrong
    val min = 9007199254740993L // 2^53 + 1
    val max = min + 999L        // range 1000 over 256 buckets
    val vals = Seq(min, min + 1, min + 3, min + 4, min + 499, min + 996, max)
    val got = vals.toDF("v")
      .select($"v", ZOrder.bucket($"v", min, max, bits = 8).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      val want = (java.math.BigInteger.valueOf(v - min)
        .multiply(java.math.BigInteger.valueOf(256))
        .divide(java.math.BigInteger.valueOf(1000))).longValueExact()
      assert(got(v) == want, s"bucket($v) = ${got(v)}, want $want")
    }
    assert(got(max) == 255L, "max must land in the last bucket")
  }

  test("z-clustered partitions are narrow in BOTH dims; 1-D sort is not") {
    import spark.implicits._
    // a full 64x64 grid; 16 output splits. Sorted by `a` alone, every
    // partition spans the whole b range (64). Z-ordered, each partition
    // covers ~4 contiguous z-squares, so both extents stay small.
    val grid = for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong)
    val df = grid.toDF("a", "b")

    def maxExtents(laid: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val boxes = laid.withColumn("pid", spark_partition_id())
        .groupBy($"pid")
        .agg((max($"a") - min($"a")).as("ea"), (max($"b") - min($"b")).as("eb"))
        .collect()
      (boxes.map(_.getLong(1)).max, boxes.map(_.getLong(2)).max)
    }

    val (za, zb) = maxExtents(ZOrder.cluster(df, "a", "b", bits = 6, numPartitions = 16))
    val (_, sb) = maxExtents(
      df.repartitionByRange(16, $"a").sortWithinPartitions($"a"))

    assert(sb == 63L, "primary-key sort leaves the secondary dim full-width")
    assert(za <= 31L && zb <= 31L,
      s"z-order must bound BOTH extents (got a=$za, b=$zb); " +
        "16 splits of the 64x64 z-curve are 4-square runs, never a full row")
  }

  test("cluster preserves rows exactly and orders partitions by z") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("a", "b")
    val out = ZOrder.cluster(df, "a", "b", bits = 8, numPartitions = 4)
    assert(out.columns.toSeq == Seq("a", "b"), "__z must not leak")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == rows.sorted, "clustering must not drop/dup rows")
    // range partitioning on z: partition ids are globally ordered by z.
    // Recompute z with the DATA's min/max (what cluster() derives) — a
    // seeded sample rarely spans the full [0,1000) domain, and assumed
    // bounds shift bucket edges enough to flip top Morton bits.
    val (aMin, aMax) = (rows.map(_._1).min, rows.map(_._1).max)
    val (bMin, bMax) = (rows.map(_._2).min, rows.map(_._2).max)
    val zmaxMin = out
      .select(spark_partition_id().as("pid"),
        ZOrder.zvalue(
          ZOrder.bucket($"a", aMin, aMax, 8),
          ZOrder.bucket($"b", bMin, bMax, 8)).as("z"))
      .groupBy($"pid").agg(min($"z").as("zmin"), max($"z").as("zmax"))
      .orderBy($"pid").collect()
    zmaxMin.sliding(2).foreach {
      case Array(p, q) =>
        assert(p.getLong(2) <= q.getLong(1),
          "later partitions must hold later z ranges")
      case _ =>
    }
  }
}
