package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  private def clicksAndWindows = {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter($"event_type" === "click").select($"user_id", $"ts", $"event_id")
    val windows = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("start_ts"),
        ($"ts" + expr("INTERVAL 2 HOURS")).as("end_ts"),
        $"event_id".as("purchase_id"))
    (clicks, windows)
  }

  test("binned range join equals the naive inequality join exactly") {
    import spark.implicits._
    val (clicks, windows) = clicksAndWindows
    val binned = RangeJoin.pointInInterval(clicks, windows,
        Seq("user_id"), "ts", "start_ts", "end_ts", binSeconds = 7200L)
      .select($"event_id", $"purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = clicks.join(windows,
        clicks("user_id") === windows("user_id") &&
          clicks("ts") >= windows("start_ts") && clicks("ts") < windows("end_ts"))
      .select($"event_id", $"purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "test data should produce matches")
    assert(binned == naive)
    // bin width far smaller than intervals must still be exact (more
    // replication, same output)
    val narrow = RangeJoin.pointInInterval(clicks, windows,
        Seq("user_id"), "ts", "start_ts", "end_ts", binSeconds = 600L)
      .select($"event_id", $"purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(narrow == naive)
  }

  test("binned range join plans as an equi join, not a nested-loop probe") {
    val (clicks, windows) = clicksAndWindows
    val df = RangeJoin.pointInInterval(clicks, windows,
      Seq("user_id"), "ts", "start_ts", "end_ts")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nested-loop in range-join plan:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), s"no equi join in plan:\n$p")
  }

  test("interval overlap equals the naive inequality join, each pair once") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val a = Seq(
      (1L, t("2024-01-01 10:00:00"), t("2024-01-01 12:00:00"), 100L),
      (1L, t("2024-01-01 15:00:00"), t("2024-01-01 16:00:00"), 101L),
      (2L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"), 102L)
    ).toDF("user_id", "a_start", "a_end", "a_id")
    val b = Seq(
      (1L, t("2024-01-01 11:30:00"), t("2024-01-01 13:00:00"), 200L), // overlaps 100
      (1L, t("2024-01-01 12:00:00"), t("2024-01-01 12:30:00"), 201L), // abuts 100 (no)
      (1L, t("2024-01-01 09:00:00"), t("2024-01-01 17:00:00"), 202L), // overlaps both
      (2L, t("2024-01-01 10:30:00"), t("2024-01-01 10:45:00"), 203L)  // contained
    ).toDF("user_id", "b_start", "b_end", "b_id")
    val got = RangeJoin.intervalOverlap(a, b, Seq("user_id"),
        "a_start", "a_end", "b_start", "b_end", binSeconds = 1800L)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = a.join(b, a("user_id") === b("user_id") &&
        a("a_start") < b("b_end") && b("b_start") < a("a_end"))
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.length == got.toSet.size, "pair emitted more than once")
    assert(got.toSet == naive)
    assert(naive == Set((100L, 200L), (100L, 202L), (101L, 202L), (102L, 203L)))
  }
}
