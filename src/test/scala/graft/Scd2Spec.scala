package graft

import graft.etl.Scd2
import graft.operators.WeightedSample
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Scd2Spec extends AnyFunSuite with SparkSpec {

  private def updates() = {
    import spark.implicits._
    Seq(
      // (key, ts, tie, state): repeated "a" snapshots collapse; the
      // a→b→a flip-flop keeps all three versions
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "b"), (1L, 50L, 5L, "a"),
      (2L, 15L, 6L, "x"),
      (3L, 10L, 7L, "m"), (3L, 10L, 8L, "n") // same-ts tie broken by id
    ).toDF("k", "ts", "tie", "state")
  }

  test("SCD2 collapses unchanged snapshots and stitches intervals") {
    import spark.implicits._
    val h = Scd2.history(updates(), keys = Seq($"k"), eventTime = $"ts",
        tieBreak = Seq($"tie"), tracked = Seq($"state"))
      .select($"k", $"state", $"effective_from", $"effective_to", $"is_current")
      .orderBy($"k", $"effective_from", $"state")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(h.toSeq == Seq(
      (1L, "a", 10L, 30L, false),
      (1L, "b", 30L, 50L, false),
      (1L, "a", 50L, -1L, true),
      (2L, "x", 15L, -1L, true),
      (3L, "m", 10L, 10L, false),
      (3L, "n", 10L, -1L, true)))
  }

  test("SCD2 has exactly one current row per key, intervals abut") {
    import spark.implicits._
    val h = Scd2.history(updates(), Seq($"k"), $"ts", Seq($"tie"), Seq($"state"))
    val curr = h.filter($"is_current").groupBy($"k").count().collect()
    assert(curr.forall(_.getLong(1) == 1))
    // every non-current effective_to equals some successor's effective_from
    val rows = h.select($"k", $"effective_from", $"effective_to").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    rows.filter(_._3.isDefined).foreach { case (k, _, Some(to)) =>
      assert(rows.exists { case (k2, from, _) => k2 == k && from == to })
    }
  }

  test("weighted sample is deterministic and favors heavier rows") {
    import spark.implicits._
    // weights: ids 0..199, even ids weight 1000, odd ids weight 1
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) 1000 else 1))
      .toDF("id", "w")
    val s1 = WeightedSample.sample(df, $"id", $"w", k = 50)
      .select($"id", $"sample_rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    val s2 = WeightedSample.sample(df, $"id", $"w", k = 50)
      .select($"id", $"sample_rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(s1.sameElements(s2), "same input must give the identical sample")
    assert(s1.length == 50)
    assert(s1.map(_._2).sorted.sameElements(1L to 50L))
    val evens = s1.count(_._1 % 2 == 0)
    assert(evens >= 45, s"1000:1 weights should dominate the sample, got $evens/50 even")
  }

  test("per-group weighted sample keeps k rows per group") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i % 3, i, 1 + (i % 7).toInt))
      .toDF("g", "id", "w")
    val s = WeightedSample.sampleByGroup(df, $"g", $"id", $"w", k = 10)
    val counts = s.groupBy($"g").count().collect()
    assert(counts.length == 3 && counts.forall(_.getLong(1) == 10))
  }
}
