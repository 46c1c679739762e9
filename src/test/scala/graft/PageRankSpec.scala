package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite with SparkSpec {

  private def baskets(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("g", "i")
  }

  test("star graph: hub outranks leaves, leaves tie exactly") {
    import spark.implicits._
    // baskets {1,2} {1,3} {1,4}: symmetric star around node 1
    val e = PageRank.coOccurrenceEdges(
      baskets((10L, 1L), (10L, 2L), (20L, 1L), (20L, 3L), (30L, 1L), (30L, 4L)),
      $"g", $"i", maxBasket = 64)
    val r = PageRank.ranks(e, iterations = 5).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    assert(r(2L) == r(3L) && r(3L) == r(4L), s"leaves must tie: $r")
    assert(r(1L) > r(2L), s"hub must outrank leaves: $r")
    graft.operators.OpCaches.releaseAll()
  }

  test("mass is approximately conserved (floor losses only)") {
    import spark.implicits._
    val e = PageRank.coOccurrenceEdges(
      Tables.lineitem(spark, sf), $"l_orderkey", $"l_partkey", maxBasket = 64)
    val total = PageRank.ranks(e, iterations = 3)
      .agg(sum($"rank_micro")).head().getLong(0)
    // each node loses < 1 micro-unit per floor division; with ~2k nodes
    // and 3 iterations the loss is parts-per-billion of the 1e12 mass
    assert(total > PageRank.TotalMass * 999L / 1000L &&
      total <= PageRank.TotalMass, s"total mass drifted: $total")
    graft.operators.OpCaches.releaseAll()
  }

  test("deterministic under repartitioning") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val out = PageRank.ranks(
        PageRank.coOccurrenceEdges(df, $"l_orderkey", $"l_partkey", 64),
        iterations = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.operators.OpCaches.releaseAll()
      out
    }
    assert(run(li) == run(li.repartition(17, $"l_partkey")))
  }

  test("oversized baskets contribute no edges") {
    import spark.implicits._
    val big = (1L to 10L).map(i => (99L, i))
    val small = Seq((1L, 100L), (1L, 101L))
    val e = PageRank.coOccurrenceEdges(
      baskets((big ++ small): _*), $"g", $"i", maxBasket = 5)
    val nodes = e.select($"src").distinct().collect().map(_.getLong(0)).toSet
    assert(nodes == Set(100L, 101L), s"capped basket leaked edges: $nodes")
  }

  test("personalized: mass concentrates at seeds, far components get none") {
    import spark.implicits._
    // two disconnected triangles; seeds (mod 97) hit only {0, 97}'s
    // component: nodes 0,1,2 triangle; 1000,1001,1002 triangle
    val e = baskets(
      (1L, 0L), (1L, 1L), (1L, 2L),
      (2L, 1000L), (2L, 1001L), (2L, 1002L))
    val edges = PageRank.coOccurrenceEdges(e, $"g", $"i", maxBasket = 8)
    val r = PageRank.personalized(edges, seedMod = 97, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    graft.operators.OpCaches.releaseAll()
    // only node 0 is a seed: its component carries ALL the mass
    assert(r(0L) > 0 && r(1L) > 0 && r(2L) > 0)
    assert(r(1000L) == 0 && r(1001L) == 0 && r(1002L) == 0,
      s"mass leaked to the unseeded component: $r")
    // the seed outranks its non-seed peers (teleport returns to it)
    assert(r(0L) > r(1L) && r(0L) > r(2L))
    // symmetric non-seed peers tie exactly (integer arithmetic)
    assert(r(1L) == r(2L))
  }

  test("transition-table form is bit-identical to the inline form") {
    import spark.implicits._
    // the serving shape (pre-built src/dst/outdeg rows, r17) must
    // reproduce the inline loop's EXACT integer ranks — same floor
    // divisions on the same outdeg values — for both the global and
    // the personalized lane
    val e = PageRank.coOccurrenceEdges(
      Tables.lineitem(spark, sf), $"l_orderkey", $"l_partkey", maxBasket = 64)
    val trans = PageRank.transitionsOf(e)
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inlineRanks = m(PageRank.ranks(e, iterations = 3))
    graft.operators.OpCaches.releaseAll()
    val transRanks = m(PageRank.ranksFromTransitions(trans, iterations = 3))
    graft.operators.OpCaches.releaseAll()
    assert(transRanks == inlineRanks)
    val inlinePpr = m(PageRank.personalized(e, seedMod = 97, iterations = 3))
    graft.operators.OpCaches.releaseAll()
    val transPpr =
      m(PageRank.personalizedFromTransitions(trans, seedMod = 97, iterations = 3))
    graft.operators.OpCaches.releaseAll()
    assert(transPpr == inlinePpr)
  }

  test("personalized is deterministic under repartitioning") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val out = PageRank.personalized(
        PageRank.coOccurrenceEdges(df, $"l_orderkey", $"l_partkey", 64),
        seedMod = 97, iterations = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.operators.OpCaches.releaseAll()
      out
    }
    assert(run(li) == run(li.repartition(17, $"l_partkey")))
  }
}
