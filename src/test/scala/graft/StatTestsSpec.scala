package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hypothesis-test queries (KS drift, Mann–Whitney): hand-computed
  * mini-cases on a synthetic orders table (the DuckDB oracle pins exact
  * values at sf0.01; these pin the STATISTICS on inputs whose answer is
  * known in closed form), plus the domain-bounded-grid plan shape. */
class StatTestsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Write a minimal orders parquet (the three columns the stats
    * queries read) into a temp dir and return the dir. */
  private def ordersDir(rows: Seq[(Double, String, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("stat_tests_").toString
    rows.map { case (price, date, prio) =>
      (price, Timestamp.valueOf(date + " 00:00:00"), prio)
    }.toDF("o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("ks: identical eras => D = 0, no drift") {
    // same two bins in both eras
    val dir = ordersDir(Seq(
      (150.0, "1997-01-01", "1-URGENT"), (250.0, "1997-01-01", "1-URGENT"),
      (150.0, "1998-06-01", "1-URGENT"), (250.0, "1998-06-01", "1-URGENT")))
    val r = SparkEntry.queries("q_ks_drift")(spark, dir).collect().head
    assert(r.getAs[Double]("d_stat") == 0.0)
    assert(r.getAs[Long]("drifted") == 0L)
  }

  test("ks: disjoint supports => D = 1 and the drift flag fires") {
    val a = (1 to 30).map(i => (100.0 + i, "1997-01-01", "1-URGENT"))
    val b = (1 to 30).map(i => (50000.0 + i, "1998-06-01", "1-URGENT"))
    val r = SparkEntry.queries("q_ks_drift")(spark, ordersDir(a ++ b))
      .collect().head
    assert(r.getAs[Double]("d_stat") == 1.0)
    // crit_95 = 1.358 * sqrt(60/900) ≈ 0.3507 < 1
    assert(r.getAs[Long]("drifted") == 1L)
  }

  test("ks: hand case — D = 0.5 attained first at the lowest bin") {
    // era A bins {1, 2}; era B bins {2, 3}; CDF gaps 0.5, 0.5, 0 —
    // max gap ties at bins 1 and 2, argmax takes the lowest bin
    val dir = ordersDir(Seq(
      (150.0, "1997-01-01", "1-URGENT"), (250.0, "1997-01-01", "1-URGENT"),
      (250.0, "1998-06-01", "1-URGENT"), (350.0, "1998-06-01", "1-URGENT")))
    val r = SparkEntry.queries("q_ks_drift")(spark, dir).collect().head
    assert(r.getAs[Double]("d_stat") == 0.5)
    assert(r.getAs[Long]("ks_bin") == 1L)
    // crit_95 = 1.358 * sqrt(4/4) = 1.358: tiny samples cannot reject
    assert(r.getAs[Double]("crit_95") == 1.358)
    assert(r.getAs[Long]("drifted") == 0L)
  }

  test("mann-whitney: hand case with a tie — 2U = 5, z = 0.408248") {
    // A (urgent) = {$500, $700}, B (low) = {$100, $700}
    // ranks over {1:B, 5:A, 7:A+B}: R_A = 2 + 3.5 = 5.5, U_A = 2.5,
    // sigma^2 = (4/12)*(5 - 6/12) = 1.5, z = 1/(2*sqrt(1.5))
    val dir = ordersDir(Seq(
      (500.0, "1997-01-01", "1-URGENT"), (700.0, "1997-01-01", "1-URGENT"),
      (100.0, "1997-01-01", "5-LOW"), (700.0, "1997-01-01", "5-LOW")))
    val r = SparkEntry.queries("q_mann_whitney")(spark, dir).collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("u2_a") == 5L)
    assert(r.getAs[Double]("z") == 0.408248)
    assert(r.getAs[Long]("reject_95") == 0L)
  }

  test("mann-whitney: A stochastically dominant => U maximal, reject at n=30") {
    val a = (1 to 30).map(i => (50000.0 + 100 * i, "1997-01-01", "1-URGENT"))
    val b = (1 to 30).map(i => (100.0 + 100 * i, "1997-01-01", "5-LOW"))
    val r = SparkEntry.queries("q_mann_whitney")(spark, ordersDir(a ++ b))
      .collect().head
    // every A beats every B: U_A = n_a*n_b = 900, doubled = 1800
    assert(r.getAs[Long]("u2_a") == 1800L)
    assert(r.getAs[Double]("z") > 1.96)
    assert(r.getAs[Long]("reject_95") == 1L)
  }

  /** Minimal events parquet (ts, user_id, value) for the CUPED test. */
  private def eventsDir(rows: Seq[(Long, String, Double)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("cuped_").toString
    rows.map { case (uid, date, v) =>
      (uid, Timestamp.valueOf(date + " 00:00:00"), v)
    }.toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("cuped: a pre-period confound is removed exactly (theta=1, rho^2=1)") {
    // y == x per user, but odd (arm 1) and even (arm 0) users have
    // different x means: the RAW arm contrast is confounded by 1.0,
    // the CUPED-adjusted contrast must be exactly zero
    val rows = (1L to 40L).flatMap(id => Seq(
      (id, "2024-01-10", id.toDouble), // pre-period covariate X
      (id, "2024-01-20", id.toDouble)  // experiment metric Y = X
    ))
    val r = SparkEntry.queries("q_cuped")(spark, eventsDir(rows))
      .collect().map(x => x.getAs[Long]("arm") -> x).toMap
    assert(r(0L).getAs[Double]("theta") == 1.0)
    assert(r(0L).getAs[Double]("mean_y") == 21.0) // evens: 2..40
    assert(r(1L).getAs[Double]("mean_y") == 20.0) // odds: 1..39
    assert(r(0L).getAs[Double]("mean_y_adj") == 20.5)
    assert(r(1L).getAs[Double]("mean_y_adj") == 20.5)
    assert(r(0L).getAs[Double]("var_reduction_ppm") == 1000000.0)
  }

  test("cuped: uncorrelated covariate leaves the metric untouched") {
    // X constant for every user => var(X)-normalized theta is 0/0-free
    // only when X varies; use X alternating independent of Y instead
    val rows = (1L to 40L).flatMap(id => Seq(
      (id, "2024-01-10", if (id <= 20) 1.0 else 2.0), // X: first half vs rest
      (id, "2024-01-20", 7.0)                          // Y constant
    ))
    val r = SparkEntry.queries("q_cuped")(spark, eventsDir(rows))
      .collect().map(x => x.getAs[Long]("arm") -> x).toMap
    // cov(X, const) = 0: no adjustment, and the zero-variance metric
    // takes the guarded branch instead of an ANSI divide-by-zero
    assert(r(0L).getAs[Double]("theta") == 0.0)
    assert(r(0L).getAs[Double]("mean_y") == 7.0)
    assert(r(0L).getAs[Double]("mean_y_adj") == 7.0)
    assert(r(0L).getAs[Double]("var_reduction_ppm") == 0.0)
  }

  /** Minimal events parquet for the power-analysis test: one view per
    * (hour, user), plus purchases for the first `conv` users. */
  private def hourlyEventsDir(spec: Seq[(Int, Int, Int)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("power_").toString
    spec.flatMap { case (h, users, conv) =>
      (1 to users).flatMap { u =>
        val uid = h * 10000L + u
        val ts = Timestamp.valueOf(f"2024-01-05 $h%02d:10:00")
        Seq((uid, ts, "view", 1.0)) ++
          (if (u <= conv) Seq((uid, ts, "purchase", 1.0)) else Nil)
      }
    }.toDF("user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("power analysis: closed-form sizes and the rarity law") {
    // hour 1: p = 0.5 -> n = 1565; hour 2: p = 0.25 -> n = 4862 (rarer
    // events need more samples for the same relative lift)
    val r = SparkEntry.queries("q_power_analysis")(spark,
      hourlyEventsDir(Seq((1, 8, 4), (2, 8, 2), (3, 8, 0))))
      .collect().map(x => x.getAs[Long]("hod") -> x).toMap
    assert(r(1L).getAs[Long]("rate_ppm") == 500000L)
    assert(r(1L).getAs[Long]("n_required") == 1565L)
    assert(r(2L).getAs[Long]("n_required") == 4862L)
    assert(r(2L).getAs[Long]("n_required") > r(1L).getAs[Long]("n_required"))
    // zero conversions: the lift is undetectable, guarded NULL
    assert(r(3L).isNullAt(r(3L).fieldIndex("n_required")))
  }

  private def dateStr(i: Int): String =
    java.time.LocalDate.of(1996, 1, 1).plusDays(i).toString

  test("bootstrap ci: brackets the point estimate and is deterministic") {
    val rows = (0 until 60).map(i =>
      (1000.0 + 37 * (i % 11), dateStr(i), "1-URGENT"))
    val dir = ordersDir(rows)
    val a = SparkEntry.queries("q_bootstrap_ci")(spark, dir).collect().head
    val b = SparkEntry.queries("q_bootstrap_ci")(spark, dir).collect().head
    assert(a == b, "seeded bootstrap must be deterministic")
    assert(a.getAs[Double]("boot_lo") <= a.getAs[Double]("mean_daily"))
    assert(a.getAs[Double]("boot_hi") >= a.getAs[Double]("mean_daily"))
    assert(a.getAs[Long]("n_days") == 60L)
  }

  test("bootstrap ci: a constant series collapses the interval to a point") {
    val rows = (0 until 40).map(i => (777.0, dateStr(i), "1-URGENT"))
    val r = SparkEntry.queries("q_bootstrap_ci")(spark, ordersDir(rows))
      .collect().head
    assert(r.getAs[Double]("boot_lo") == 777.0)
    assert(r.getAs[Double]("boot_hi") == 777.0)
    assert(r.getAs[Double]("mean_daily") == 777.0)
  }

  test("bootstrap ci: more days shrink the interval (the sqrt-n law)") {
    def width(nDays: Int): Double = {
      val rows = (0 until nDays).map(i =>
        (if (i % 2 == 0) 100.0 else 200.0, dateStr(i), "1-URGENT"))
      val r = SparkEntry.queries("q_bootstrap_ci")(spark, ordersDir(rows))
        .collect().head
      r.getAs[Double]("boot_hi") - r.getAs[Double]("boot_lo")
    }
    val w28 = width(28); val w112 = width(112)
    assert(w112 < w28, s"width did not shrink: $w28 -> $w112")
  }

  test("anova: closed-form two-group case gives F = 8 exactly") {
    // A = {100, 200}, B = {300, 400}: SSB = 40000, SSW = 10000,
    // F = (40000/1)/(10000/2) = 8 (scale-invariant, so exact in cents)
    val dir = ordersDir(Seq(
      (100.0, "1997-01-01", "1-URGENT"), (200.0, "1997-01-01", "1-URGENT"),
      (300.0, "1997-01-01", "5-LOW"), (400.0, "1997-01-01", "5-LOW")))
    val rows = SparkEntry.queries("q_anova")(spark, dir).collect()
    assert(rows.length == 2)
    val byG = rows.map(r => r.getString(0) -> r).toMap
    assert(byG("1-URGENT").getAs[Double]("mean_value") == 150.0)
    assert(byG("5-LOW").getAs[Double]("mean_value") == 350.0)
    assert(rows.head.getAs[Double]("f_stat") == 8.0)
    assert(rows.head.getAs[Long]("df_between") == 1L)
    assert(rows.head.getAs[Long]("df_within") == 2L)
  }

  test("anova: identical group distributions give F = 0") {
    val dir = ordersDir(Seq(
      (100.0, "1997-01-01", "1-URGENT"), (200.0, "1997-01-01", "1-URGENT"),
      (100.0, "1997-01-01", "5-LOW"), (200.0, "1997-01-01", "5-LOW")))
    val f = SparkEntry.queries("q_anova")(spark, dir)
      .collect().head.getAs[Double]("f_stat")
    assert(f == 0.0, s"F $f")
  }

  test("benford: digit extraction exact, chi2 matches the literal recompute") {
    // 10 orders per digit d with value d*111: digits uniform — far
    // from Benford, chi2 recomputable in closed form
    val rows = (1 to 9).flatMap(d =>
      (1 to 10).map(_ => (d * 111.0, "1997-01-01", "1-URGENT")))
    val out = SparkEntry.queries("q_benford")(spark, ordersDir(rows))
      .collect()
    assert(out.length == 9)
    out.foreach { r =>
      assert(r.getAs[Long]("n") == 10L, s"digit ${r.getLong(0)}")
      assert(r.getAs[Long]("obs_ppm") == 111111L)
    }
    val expected = Seq(0.30103000, 0.17609126, 0.12493874, 0.09691001,
      0.07918125, 0.06694679, 0.05799195, 0.05115252, 0.04575749)
    val want = BigDecimal(expected.map { e =>
      BigDecimal((10.0 - e * 90) * (10.0 - e * 90) / (e * 90))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getAs[Double]("chi2") == want)
  }

  test("simpsons: a planted reversal is flagged, clean data is not") {
    // groups slope -1 within, +1.38 across: the canonical paradox
    def liDir(rows: Seq[(String, Double, Double)]): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("simpson_").toString
      rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      dir
    }
    val planted = SparkEntry.queries("q_simpsons")(spark, liDir(Seq(
      ("A", 1.0, 10.0), ("A", 2.0, 9.0),
      ("B", 8.0, 20.0), ("B", 9.0, 19.0)))).collect()
    assert(planted.forall(_.getAs[Double]("slope_group") == -1.0))
    assert(planted.head.getAs[Double]("slope_within") == -1.0)
    assert(planted.head.getAs[Double]("slope_aggregate") == 1.38)
    assert(planted.forall(_.getAs[Long]("reversal") == 1L))
    // aligned groups: all slopes positive, no flag
    val clean = SparkEntry.queries("q_simpsons")(spark, liDir(Seq(
      ("A", 1.0, 10.0), ("A", 2.0, 12.0),
      ("B", 8.0, 20.0), ("B", 9.0, 23.0)))).collect()
    assert(clean.forall(_.getAs[Long]("reversal") == 0L))
    assert(clean.head.getAs[Double]("slope_within") > 0.0)
  }

  test("plan: both tests collapse to the bin grid before any window") {
    for (q <- Seq("q_ks_drift", "q_mann_whitney")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      // the single unpartitioned window runs over the aggregated grid,
      // never the corpus: an aggregate must sit BELOW the window
      val wi = plan.indexOf("Window")
      assert(wi >= 0, s"$q: expected a window over the bin grid")
      assert(plan.indexOf("HashAggregate", wi) > wi,
        s"$q: window is not over the bin-aggregated grid:\n$plan")
      // ranks are relational midranks, not per-row rank windows
      assert(!plan.contains("row_number") && !plan.contains("rank("),
        s"$q: per-row rank window crept in")
    }
  }
}
