package graft

import graft.operators.Survival
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SurvivalSpec extends AnyFunSuite with SparkSpec {

  private def km(rows: Seq[(Long, Long)]): Array[(Long, Long, Long, Double)] = {
    import spark.implicits._
    Survival.kaplanMeier(rows.toDF("duration", "observed"),
        $"duration", $"observed")
      .orderBy($"t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
  }

  test("textbook curve with censoring") {
    // subjects: events at t=1 (1 of 7 at risk), t=3 (2 of 5), t=5 (1 of 2);
    // censored at t=2, t=4, t=6 thin the risk set without stepping S
    val subjects = Seq[(Long, Long)](
      (1, 1), (2, 0), (3, 1), (3, 1), (4, 0), (5, 1), (6, 0))
    val curve = km(subjects)
    assert(curve.map(c => (c._1, c._2, c._3)).toSeq ==
      Seq((1L, 7L, 1L), (3L, 5L, 2L), (5L, 2L, 1L)))
    val s1 = 1.0 * (1.0 - 1.0 / 7.0)
    val s3 = s1 * (1.0 - 2.0 / 5.0)
    val s5 = s3 * (1.0 - 1.0 / 2.0)
    assert(curve.map(_._4).toSeq == Seq(s1, s3, s5).map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("with no censoring KM equals the empirical survivor function") {
    val durations = Seq[Long](1, 1, 2, 3, 3, 3, 4, 7, 7, 9)
    val curve = km(durations.map(d => (d, 1L)))
    val n = durations.size.toDouble
    curve.foreach { case (t, _, _, s) =>
      val empirical = durations.count(_ > t) / n
      assert(math.abs(s - empirical) < 1e-9,
        s"t=$t: KM $s vs empirical $empirical")
    }
  }

  test("curve is monotone non-increasing in (0, 1] on real lifetimes") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val perUser = ev.groupBy($"user_id")
      .agg(min($"ts").as("a"), max($"ts").as("b"))
    val gm = ev.agg(max($"ts").as("m"))
    val subjects = perUser.crossJoin(broadcast(gm))
      .select(expr("(unix_micros(b) - unix_micros(a)) div 3600000000").as("t"),
        when($"b" < $"m" - expr("INTERVAL 24 HOUR"), 1L).otherwise(0L).as("obs"))
    val curve = Survival.kaplanMeier(subjects, $"t", $"obs")
      .orderBy($"t").collect().map(_.getDouble(3))
    assert(curve.nonEmpty, "no event times on real data")
    assert(curve.forall(s => s > 0 && s <= 1))
    assert(curve.zip(curve.drop(1)).forall { case (a, b) => b <= a },
      "survival must be non-increasing")
  }

  test("censoring only thins risk sets: fully-censored rows add no steps") {
    val base = Seq[(Long, Long)]((2, 1), (4, 1))
    val withCensored = base ++ Seq[(Long, Long)]((1, 0), (3, 0), (9, 0))
    val a = km(base)
    val b = km(withCensored)
    assert(a.map(_._1).sameElements(b.map(_._1)), "event times changed")
    // the late censored subject (t=9) inflates every risk set it survives
    assert(b.head._2 == 4 && a.head._2 == 2)
  }
}
