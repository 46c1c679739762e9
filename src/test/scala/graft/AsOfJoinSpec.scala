package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  test("backward as-of join matches a driver-side reference (inclusive, left-join)") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("pvalue"))

    val got = AsOfJoin.backward(clicks, purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("pvalue"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)) ->
        (Option(r.getTimestamp(3)), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap

    val ps = purchases.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .groupBy(_._1)
    clicks.collect().foreach { c =>
      val (u, t, id) = (c.getLong(0), c.getTimestamp(1), c.getLong(2))
      val expected = ps.getOrElse(u, Array.empty)
        .filter(p => !p._2.after(t))             // inclusive: p.ts <= t
        .sortBy(_._2.getTime).lastOption
        .map(p => (Some(p._2), Some(p._3)))
        .getOrElse((None, None))
      assert(got((u, t, id)) == expected, s"mismatch for click ($u, $t, $id)")
    }
    assert(got.values.exists(_._1.isEmpty), "some clicks should be unmatched")
    assert(got.values.exists(_._1.isDefined), "some clicks should match")
  }

  test("forward as-of join matches a driver-side reference (inclusive, left-join)") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("pvalue"))

    val got = AsOfJoin.forward(clicks, purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("pvalue"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)) ->
        (Option(r.getTimestamp(3)), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap

    val ps = purchases.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .groupBy(_._1)
    clicks.collect().foreach { c =>
      val (u, t, id) = (c.getLong(0), c.getTimestamp(1), c.getLong(2))
      val expected = ps.getOrElse(u, Array.empty)
        .filter(p => !p._2.before(t))            // inclusive: p.ts >= t
        .sortBy(_._2.getTime).headOption         // EARLIEST following
        .map(p => (Some(p._2), Some(p._3)))
        .getOrElse((None, None))
      assert(got((u, t, id)) == expected, s"mismatch for click ($u, $t, $id)")
    }
    assert(got.values.exists(_._1.isEmpty), "some clicks should be unmatched")
    assert(got.values.exists(_._1.isDefined), "some clicks should match")
  }

  test("forward tolerance nulls out matches beyond the look-ahead window") {
    import spark.implicits._
    val left = Seq((1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-01 06:00:00", "b"))
      .toDF("k", "t", "tag").withColumn("t", $"t".cast("timestamp"))
    val right = Seq((1L, "2024-01-01 10:30:00", 7.0))
      .toDF("k", "t", "v").withColumn("t", $"t".cast("timestamp"))
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "t", Seq("v"),
        tolerance = Some("INTERVAL 1 HOUR"))
      .orderBy($"t").collect()
    // 06:00 → next right is 4.5h ahead: beyond tolerance, nulled
    assert(out(0).isNullAt(out(0).fieldIndex("asof_v")))
    // 10:00 → 30 min ahead: within tolerance
    assert(out(1).getAs[Any]("asof_v") == 7.0)
  }

  test("tolerance nulls out matches older than the lookback window") {
    import spark.implicits._
    val left = Seq((1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-01 12:00:00", "b"))
      .toDF("k", "t", "tag").withColumn("t", $"t".cast("timestamp"))
    val right = Seq((1L, "2024-01-01 09:30:00", 7.0))
      .toDF("k", "t", "v").withColumn("t", $"t".cast("timestamp"))
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"),
        tolerance = Some("INTERVAL 1 HOUR"))
      .orderBy($"t").collect()
    assert(out(0).getAs[Any]("asof_v") == 7.0)   // 30 min back: within tolerance
    assert(out(1).getAs[Any]("asof_v") == null)  // 2.5 h back: nulled
  }

  test("right rows at the same time as a left row match (inclusive) and ties break by rightTieBreak") {
    import spark.implicits._
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 1L, 100.0), (1L, 10L, 2L, 200.0))
      .toDF("k", "t", "seq", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"),
      rightTieBreak = Seq("seq")).collect()
    assert(out.head.getAs[Double]("asof_v") == 200.0, "last-by-tiebreak must win")
  }

  test("plan is one window over a union — no nested-loop range join") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter($"event_type" === "click").select($"user_id", $"ts", $"event_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("pvalue"))
    val df = AsOfJoin.backward(clicks, purchases,
      Seq("user_id"), "ts", "ts", Seq("pvalue"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range-probe join in as-of plan:\n$p")
    assert(p.contains("Window"), s"no window in as-of plan:\n$p")
    assert(p.contains("Union"), s"no union in as-of plan:\n$p")
  }
}
