package graft

import java.sql.Timestamp
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Holt–Winters seasonal smoothing: fixed points and season-tracking
  * on synthetic daily series (the oracle pins the real-data run). */
class HoltWintersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Consecutive daily orders from 1995-01-01, one order per day. */
  private def dailyDir(values: Seq[Double]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("hw_").toString
    values.zipWithIndex.map { case (v, i) =>
      (Timestamp.valueOf(
        LocalDate.of(1995, 1, 1).plusDays(i).atStartOfDay()), v)
    }.toDF("o_orderdate", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("constant series is a fixed point: level=c, trend=0, all forecasts=c") {
    val r = SparkEntry.queries("q_holt_winters")(
      spark, dailyDir(Seq.fill(30)(420.0))).collect().head
    assert(r.getAs[Long]("n_days") == 30L)
    assert(r.getAs[Double]("level_last") == 420.0)
    assert(r.getAs[Double]("trend_last") == 0.0)
    for (h <- 1 to 7)
      assert(r.getAs[Double](s"f$h") == 420.0, s"f$h drifted off the fixed point")
  }

  test("rising series: positive trend, forecasts increase with horizon") {
    val r = SparkEntry.queries("q_holt_winters")(
      spark, dailyDir((1 to 60).map(_ * 10.0))).collect().head
    assert(r.getAs[Double]("trend_last") > 0.0)
    assert(r.getAs[Double]("f7") > r.getAs[Double]("f1"))
  }

  test("backtest: a constant series gives every model exactly zero error") {
    val rows = SparkEntry.queries("q_forecast_backtest")(
      spark, dailyDir(Seq.fill(30)(420.0))).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_evals") == 29L)
      assert(r.getAs[Double]("mae") == 0.0, s"${r.getString(0)}")
      assert(r.getAs[Double]("rmse") == 0.0, s"${r.getString(0)}")
    }
  }

  test("backtest: only Holt-Winters absorbs a strong weekly pattern") {
    val vals = (0 until 70).map(i => if (i % 7 == 0) 1000.0 else 100.0)
    val mae = SparkEntry.queries("q_forecast_backtest")(
      spark, dailyDir(vals)).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("mae")).toMap
    assert(mae("holt_winters") < mae("ewma"), s"$mae")
    assert(mae("holt_winters") < mae("holt"), s"$mae")
  }

  test("backtest: the trend term earns its keep on a rising series") {
    val mae = SparkEntry.queries("q_forecast_backtest")(
      spark, dailyDir((1 to 60).map(_ * 10.0))).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("mae")).toMap
    assert(mae("holt") < mae("ewma"), s"$mae")
  }

  test("weekly pattern: the spike day forecasts highest in the fan") {
    // spike on day index 0 of every week, 10 full cycles
    val vals = (0 until 70).map(i => if (i % 7 == 0) 1000.0 else 100.0)
    val r = SparkEntry.queries("q_holt_winters")(
      spark, dailyDir(vals)).collect().head
    // n=70: f_h carries seasonal index (69+h) % 7, so h=1 lands on the
    // spike weekday
    val fan = (1 to 7).map(h => r.getAs[Double](s"f$h"))
    assert(fan.head == fan.max, s"spike weekday not dominant: $fan")
    assert(fan.head > fan.tail.max + 100.0,
      "seasonal component failed to absorb the spike")
  }
}
