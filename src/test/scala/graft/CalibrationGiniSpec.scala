package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_lr_calibration (classifier reliability diagram) and q_gini
  * (revenue-concentration audit): partition/bound invariants plus
  * closed-form extremes. */
class CalibrationGiniSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("calibration bins partition the corpus and stay inside their decile") {
    val out = SparkEntry.queries("q_lr_calibration")(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
    out.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(b >= 0L && b <= 9L)
      val mp = r.getAs[Double]("mean_p")
      // mean of probabilities inside decile b lies in its range
      // (bin 9 also holds p = 1.0; rounding at 6 can graze the edge)
      assert(mp >= b / 10.0 - 1e-6 && mp <= (b + 1) / 10.0 + 1e-6,
        s"bin $b mean_p $mp outside decile")
      // gap column is exactly the recomputation from its siblings
      val gap = r.getAs[Double]("calib_gap")
      val want = BigDecimal(mp - r.getAs[Long]("emp_rate_ppm") / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gap == want, s"bin $b gap $gap != $want")
    }
  }

  test("the classifier is informative: top decile outranks the bottom") {
    val out = SparkEntry.queries("q_lr_calibration")(spark, sf).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("emp_rate_ppm")).toMap
    val lo = out.filterKeys(_ <= 2).values
    val hi = out.filterKeys(_ >= 7).values
    assert(lo.nonEmpty && hi.nonEmpty, s"degenerate bin spread: $out")
    assert(hi.max > lo.min,
      "high-probability deciles must carry a higher positive rate")
  }

  private def ordersDir(rows: Seq[(Long, Double)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("gini_").toString
    rows.toDF("o_custkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("gini: perfect equality is exactly zero") {
    val r = SparkEntry.queries("q_gini")(
      spark, ordersDir((1L to 100L).map(k => (k, 500.0)))).collect().head
    assert(r.getAs[Long]("n_customers") == 100L)
    assert(r.getAs[Double]("gini") == 0.0)
  }

  test("gini: one customer holding ~everything approaches 1") {
    val rows = (1L to 99L).map(k => (k, 1.0)) :+ (100L, 10000000.0)
    val r = SparkEntry.queries("q_gini")(spark, ordersDir(rows))
      .collect().head
    assert(r.getAs[Double]("gini") > 0.95,
      s"gini ${r.getAs[Double]("gini")} too low for extreme concentration")
  }

  test("gini on the real order book sits strictly inside (0, 1)") {
    val g = SparkEntry.queries("q_gini")(spark, sf)
      .collect().head.getAs[Double]("gini")
    assert(g > 0.0 && g < 1.0, s"gini $g")
  }
}
