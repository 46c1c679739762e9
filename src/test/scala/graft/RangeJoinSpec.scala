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
}
