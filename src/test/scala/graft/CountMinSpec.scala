package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite with SparkSpec {

  test("estimates never undercount, and exact-count keys match exactly") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val est = CountMin.estimates(ev, $"user_id", width = 256)
    val exact = ev.groupBy($"user_id".as("key"))
      .agg(count(lit(1)).as("tc"))
    val joined = est.join(exact, "key")
    assert(joined.filter($"est_count" < $"tc").count() == 0,
      "CMS undercounted — impossible by construction, hash bug")
    // with few keys vs 3×256 counters most keys are collision-free
    val n = joined.count()
    val exactHits = joined.filter($"est_count" === $"tc").count()
    assert(exactHits * 2 > n, s"only $exactHits/$n keys exact — " +
      "collision rate implausible for this width")
  }

  test("sketch size is bounded at d*w rows regardless of input size") {
    import spark.implicits._
    val big = spark.range(100000).select((col("id") % 5000).as("k"))
    val sk = CountMin.sketch(big, $"k", width = 64)
    assert(sk.count() <= CountMin.Seeds.size * 64L)
    // total mass is conserved: every input row lands in every hash row
    val mass = sk.groupBy($"row").agg(sum($"cnt").as("m"))
      .collect().map(_.getLong(1)).toSet
    assert(mass == Set(100000L), s"mass per hash row: $mass")
  }

  test("deterministic under repartitioning") {
    import spark.implicits._
    val ev = Tables.events(spark, sf).select($"user_id")
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      CountMin.estimates(df, $"user_id", width = 128)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(ev) == run(ev.repartition(11)))
  }

  test("join-size estimate never undercounts, and is exact sans collisions") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("c"))
      .agg(sum($"c" * $"c")).collect().head.getLong(0)
    // few distinct users vs a wide sketch: collision-free → exact
    val wide = CountMin.joinSizeEstimate(ev, $"user_id", ev, $"user_id",
      width = 65536).collect().head.getLong(0)
    assert(wide >= exact, "AMS inner product undercounted — impossible")
    assert(wide == exact,
      s"collision-free sketch should be exact: $wide vs $exact")
    // a cramped sketch still never undercounts
    val cramped = CountMin.joinSizeEstimate(ev, $"user_id", ev, $"user_id",
      width = 16).collect().head.getLong(0)
    assert(cramped >= exact)
  }

  test("join-size estimate on two different tables") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val exact = li.join(o, $"l_orderkey" === $"o_orderkey").count()
    val est = CountMin.joinSizeEstimate(li, $"l_orderkey", o, $"o_orderkey",
      width = 65536).collect().head.getLong(0)
    assert(est >= exact && est <= exact * 2,
      s"estimate $est implausible vs exact $exact")
  }
}
