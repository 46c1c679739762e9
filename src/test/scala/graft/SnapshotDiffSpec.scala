package graft

import graft.etl.{Compaction, SnapshotDiff}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SnapshotDiffSpec extends AnyFunSuite with SparkSpec {

  test("diff classifies added/removed/changed/unchanged correctly") {
    import spark.implicits._
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val after = Seq((2L, "b", 20.0), (3L, "c", 99.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val d = SnapshotDiff.diff(before, after, Seq("k"), Seq("name", "v"))
      .select($"k", $"diff_class").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
  }

  test("diff is null-safe on payload comparison") {
    import spark.implicits._
    val before = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "p")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "p")
    val d = SnapshotDiff.diff(before, after, Seq("k"), Seq("p"))
      .select($"k", $"diff_class").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("binPack packs each partition into floor(total/target)+1 bins") {
    import spark.implicits._
    val target = 120L
    val files = (1 to 57).map(i => ("p" + (i % 3), i.toLong, (i * 37 % 97 + 5).toLong))
      .toDF("part", "file_id", "bytes")
    val packed = Compaction.binPack(files, Seq($"part"), $"bytes",
      $"file_id", target)
    // every file appears exactly once
    assert(packed.count() == 57)
    val sizes = files.collect()
      .map(r => r.getString(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val binsOf = packed.select($"part", $"bin").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    sizes.foreach { case (p, sz) =>
      val total = sz.sum
      val expectBins = total / target + 1
      // bins are contiguous 0..n-1 and within one of the size-floor optimum
      assert(binsOf(p).toList == (0L until expectBins).toList,
        s"partition $p: bins ${binsOf(p).toList} for total $total")
      // undershoot of any bin is bounded by its predecessor's overshoot,
      // which is at most the largest file: bin spans are target-wide
      val maxFile = sz.max
      val binSz = packed.filter($"part" === p).groupBy($"bin")
        .agg(sum($"bytes").as("s")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      binsOf(p).dropRight(1).foreach { b =>
        assert(binSz(b) + maxFile >= target,
          s"bin $p/$b size ${binSz(b)} violates the span bound")
      }
    }
  }

  test("binPack is deterministic under repartitioning") {
    import spark.implicits._
    val files = (1 to 200).map(i => (i % 5, i.toLong, (i * 13 % 50 + 1).toLong))
      .toDF("part", "file_id", "bytes")
    def run(df: org.apache.spark.sql.DataFrame) =
      Compaction.binPack(df, Seq($"part"), $"bytes", $"file_id", 60L)
        .select($"part", $"file_id", $"bin").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(files) == run(files.repartition(7)))
  }
}
