package graft

import graft.operators.KCore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KCoreSpec extends AnyFunSuite with SparkSpec {

  /** Symmetric edge list from undirected pairs. */
  private def graph(pairs: (Long, Long)*) = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  private def coreMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pendant nodes peel away; the triangle is the 2-core") {
    // triangle 1-2-3 with pendant chain 3-4-5
    val g = graph((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = coreMap(KCore.core(g, k = 2))
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $got")
  }

  test("peeling cascades: removing the tail un-qualifies its anchor") {
    // 4-clique with a path hung off it: the path needs >1 peel round
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val path = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = coreMap(KCore.core(graph((clique ++ path): _*), k = 2))
    assert(got.keySet == Set(1L, 2L, 3L, 4L), s"path survived: $got")
  }

  test("chain has an empty 2-core") {
    val g = graph((1L, 2L), (2L, 3L), (3L, 4L))
    assert(KCore.core(g, k = 2).count() == 0)
  }

  test("every core member's in-core degree is >= k (co-purchase graph)") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf).filter($"l_orderkey" % 50 === 0)
    val edges = graft.operators.PageRank.coOccurrenceEdges(
      li, $"l_orderkey", $"l_partkey", maxBasket = 8)
    val core = KCore.core(edges, k = 4)
    assert(core.count() > 0, "4-core empty at sf0.001")
    assert(core.filter($"core_degree" < 4).count() == 0)
  }

  test("deterministic under repartitioning") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf).filter($"l_orderkey" % 50 === 0)
    def run(shuffled: Boolean): Map[Long, Long] = {
      val base = li.select($"l_orderkey", $"l_partkey")
      val d = if (shuffled) base.repartition(13, $"l_partkey") else base
      coreMap(KCore.core(graft.operators.PageRank.coOccurrenceEdges(
        d, $"l_orderkey", $"l_partkey", maxBasket = 8), k = 4))
    }
    assert(run(false) == run(true))
  }
}
