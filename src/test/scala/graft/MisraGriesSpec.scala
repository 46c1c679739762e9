package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries sketch aggregate + the sketch-then-recount heavy-hitter
  * operator. */
class MisraGriesSpec extends AnyFunSuite with SparkSpec {

  test("sketch keeps at most k counters and under-counts by at most n/(k+1)") {
    import spark.implicits._
    // zipf-ish synthetic stream with KNOWN exact counts: item i appears
    // 1000/i times, plus 2000 singletons as noise
    val items =
      (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"hot$i")) ++
        (1 to 2000).map(i => s"noise$i")
    val n = items.size
    val k = 64
    val df = items.toDF("item").repartition(7) // arbitrary partitioning
    val sk = df.agg(graft.plans.MisraGries.sketch($"item", k).as("sk"))
      .select(explode($"sk").as("c"))
      .select($"c.item", $"c.count_lb")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.size <= k)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    sk.foreach { case (item, lb) =>
      assert(lb <= exact(item), s"$item over-counted: lb=$lb > ${exact(item)}")
      assert(exact(item) - lb <= n / (k + 1) + 1,
        s"$item under-counted beyond bound: lb=$lb exact=${exact(item)}")
    }
    // no false negatives above n/(k+1): every such item is IN the sketch
    exact.filter(_._2 > n / (k + 1)).keys.foreach { item =>
      assert(sk.contains(item), s"true heavy hitter $item evicted")
    }
  }

  test("sketch-then-recount equals the exact heavy-hitter computation") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.tokens($"text")).as("token"))
    val approx = HeavyHitters.approx(toks, $"token", support = 0.01, k = 256)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val total = toks.count().toDouble
    val exact = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= total * 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(approx == exact)
  }

  test("recounted output is invariant under repartitioning") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.tokens($"text")).as("token"))
    def run(parts: Int) =
      HeavyHitters.approx(toks.repartition(parts), $"token", 0.01, k = 256)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run(3) == run(17))
  }

  test("support at or below 1/(k+1) is rejected") {
    import spark.implicits._
    val df = Seq("a").toDF("token")
    intercept[IllegalArgumentException] {
      HeavyHitters.approx(df, $"token", support = 0.001, k = 100)
    }
  }
}
