package graft

import graft.operators.Hits
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HITS on graphs with a closed-form fixed point: the decimal-grid
  * iteration must reproduce hand-computed scores exactly (the oracle
  * pins the real-data run; these pin the algebra). */
class HitsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // star + appendix: 10 -> {1,2,3,4}, 20 -> {1}
  private def star() = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (20L, 1L)
  ).toDF("src", "dst")

  test("two rounds on the star match the hand-computed decimal grid") {
    val got = Hits.scores(star(), iters = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    // a1: {1: .4, rest .2}; h1: {10: .71428571, 20: .28571429}
    // a2r: {1: 1.0, rest .71428571}, tot 3.14285713
    assert(got(("authority", 1L))._1 == 0.31818182)
    assert(got(("authority", 2L))._1 == 0.22727273)
    assert(got(("authority", 2L)) == got(("authority", 3L)))
    assert(got(("authority", 3L)) == got(("authority", 4L)))
    // h2r: {10: 1.00000001, 20: .31818182}, tot 1.31818183
    assert(got(("hub", 10L))._1 == 0.75862069)
    assert(got(("hub", 20L))._1 == 0.24137931)
    // degrees ride along
    assert(got(("authority", 1L))._2 == 2L)
    assert(got(("hub", 10L))._2 == 4L)
  }

  test("each side stays L1-normalized (within the round-8 grid) and finite") {
    val rows = Hits.scores(star(), iters = 3).collect()
    for (side <- Seq("authority", "hub")) {
      val tot = rows.filter(_.getString(0) == side).map(_.getDouble(2)).sum
      assert(math.abs(tot - 1.0) < 1e-6, s"$side L1 mass $tot")
    }
    assert(rows.forall(r => !r.getDouble(2).isNaN && r.getDouble(2) > 0))
  }

  test("disconnected components rank within one shared normalization") {
    // two independent stars: the bigger star's hub carries more mass
    val e = star().union(Seq(
      (30L, 7L), (30L, 8L)).toDF("src", "dst"))
    val hubs = Hits.scores(e, iters = 2)
      .filter($"side" === "hub").collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(hubs(10L) > hubs(30L) && hubs(30L) > 0.0)
  }

  test("plan: no cartesian product (totals broadcast as 1-row joins)") {
    val plan = Hits.scores(star(), iters = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
