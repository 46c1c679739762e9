package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL sketch-union rollup (q_sketch_union's machinery): pre-aggregated
  * per-day sketches must answer cross-range distinct questions without
  * rescanning raw events. */
class SketchUnionSpec extends AnyFunSuite with SparkSpec {

  test("union of daily sketches approximates the exact cross-range distinct") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val daily = ev.groupBy(to_date($"ts").as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val est = daily
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().head.getLong(0)
    val exact = ev.select($"user_id").distinct().count()
    // HLL default lgK=12 → rsd ~1.6%; allow 5%
    assert(math.abs(est - exact) <= math.max(2L, (exact * 0.05).toLong),
      s"estimate $est vs exact $exact")
  }

  test("sketch union is insensitive to day partitioning of the same events") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    def unionEst(groupCol: org.apache.spark.sql.Column): Long =
      ev.groupBy(groupCol.as("g"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        .collect().head.getLong(0)
    // same event set sliced two different ways → identical merged sketch
    assert(unionEst(to_date($"ts")) == unionEst($"user_id" % 7))
  }
}
