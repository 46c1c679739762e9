package graft

import graft.operators.TimeSeries
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {

  test("gap fill densifies each key's span, zeros gaps, carries values forward") {
    import spark.implicits._
    val ev = Seq(
      (7L, Timestamp.valueOf("2024-01-01 10:15:00"), 5.0),
      (7L, Timestamp.valueOf("2024-01-01 13:40:00"), 3.0), // 11:00 + 12:00 missing
      (9L, Timestamp.valueOf("2024-01-01 00:30:00"), 1.0)  // singleton key
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.gapFill(ev, $"user_id", $"ts", $"value", 3600L)
      .orderBy($"k", $"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val u7 = got.filter(_._1 == 7L)
    assert(u7.length == 4) // 10:00 .. 13:00 inclusive
    assert(u7.map(_._3).toSeq == Seq(1L, 0L, 0L, 1L))
    assert(u7.map(_._4).toSeq == Seq(5.0, 5.0, 5.0, 3.0)) // carry-forward
    // contiguous hourly grid
    assert(u7.map(_._2).sliding(2).forall { case Array(a, b) => b - a == 3600 })
    assert(got.count(_._1 == 9L) == 1)
  }

  test("gap fill plan: grid explodes row-locally from per-key spans, no cross join") {
    import spark.implicits._
    val plan = TimeSeries.gapFill(Tables.events(spark, sf),
        $"user_id", $"ts", $"value", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"calendar cross join crept in:\n$plan")
  }
}
