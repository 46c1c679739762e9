package graft

import graft.etl.CdcMerge
import org.scalatest.funsuite.AnyFunSuite

class CdcMergeSpec extends AnyFunSuite with SparkSpec {

  test("merge applies latest-wins upserts, deletes, and inserts") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "U", "b1", 1L), (2L, "U", "b2", 2L), // two updates → latest wins
      (3L, "D", "x", 1L),                       // delete
      (4L, "U", "new", 1L),                     // insert (key not in base)
      (5L, "U", "tmp", 1L), (5L, "D", "tmp", 2L) // insert then delete → absent
    ).toDF("k", "op", "v", "ver")
    val got = CdcMerge.merge(base, changes, keys = Seq("k"),
        opCol = $"op", version = Seq($"ver"))
      .orderBy($"k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      (1L, "a", false),   // untouched
      (2L, "b2", true),   // latest update
      (4L, "new", true))) // inserted; 3 and 5 deleted
  }

  test("merge result stays unique per key") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, "U", "a1", 1L), (1L, "U", "a2", 2L), (1L, "U", "a3", 3L))
      .toDF("k", "op", "v", "ver")
    val got = CdcMerge.merge(base, changes, Seq("k"), $"op", Seq($"ver"))
    assert(got.count() == 2)
    assert(got.groupBy($"k").count().collect().forall(_.getLong(1) == 1))
    val v1 = got.filter($"k" === 1).select($"v").collect().head.getString(0)
    assert(v1 == "a3")
  }

  test("delete of a missing key is a no-op") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((9L, "D", "x", 1L)).toDF("k", "op", "v", "ver")
    val got = CdcMerge.merge(base, changes, Seq("k"), $"op", Seq($"ver"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a")))
  }
}
