package graft

import graft.operators.Bfs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BfsSpec extends AnyFunSuite with SparkSpec {

  private def sym(pairs: (Long, Long)*) = {
    import spark.implicits._
    val e = pairs.toDF("src", "dst")
    e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
  }

  test("min hops on a known path graph, multi-source") {
    import spark.implicits._
    // 1-2-3-4-5  and  10-11; seeds {1, 10}
    val e = sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 10L -> 11L)
    val seeds = Seq(1L, 10L).toDF("node")
    val got = Bfs.minHops(e, seeds, maxHops = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      10L -> 0L, 11L -> 1L))
  }

  test("maxHops truncates; unreached nodes are absent") {
    import spark.implicits._
    val e = sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 7L -> 8L)
    val seeds = Seq(1L).toDF("node")
    val got = Bfs.minHops(e, seeds, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("shortcut edges take the shorter route") {
    import spark.implicits._
    // ring 1-2-3-4-5-6-1: node 4 is 3 hops one way, 2 the other... plus
    // a chord 1-4 making it 1
    val e = sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L,
      6L -> 1L, 1L -> 4L)
    val seeds = Seq(1L).toDF("node")
    val got = Bfs.minHops(e, seeds, maxHops = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(4L) == 1L && got(3L) == 2L && got(5L) == 2L)
  }

  test("deterministic and settles each node once (hops unique per node)") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf).filter($"l_orderkey" % 50 === 0)
    val edges = operators.PageRank.coOccurrenceEdges(
      li, $"l_orderkey", $"l_partkey", maxBasket = 8)
    val seeds = edges.select($"src".as("node")).distinct()
      .filter($"node" % 10 === 0)
    val r = Bfs.minHops(edges, seeds, maxHops = 6)
    assert(r.groupBy($"node").count().filter($"count" > 1).count() == 0)
    val again = Bfs.minHops(edges.repartition(7), seeds, maxHops = 6)
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1))).toSet ==
      again.collect().map(x => (x.getLong(0), x.getLong(1))).toSet)
  }
}
