package graft

import graft.operators.LabelProp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LabelPropSpec extends AnyFunSuite with SparkSpec {

  private def edgesOf(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // symmetrize: the operator contract is an undirected graph given as
    // both directions (same as PageRank.coOccurrenceEdges output)
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  /** Reference: synchronous LPA with (count DESC, label ASC) adoption. */
  private def refPropagate(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(labels).view.mapValues(_.size)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("two triangles with a bridge resolve to two communities") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val got = LabelProp.propagate(edgesOf(e: _*), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPropagate(e, 4))
    // triangle {1,2,3} all share a label; {5,6} share the other side's
    assert(got(1) == got(2) && got(2) == got(3))
    assert(got(5) == got(6))
  }

  test("matches the reference on a random graph and is partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val e = Seq.fill(60)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(p => p._1 != p._2).distinct
    val df = edgesOf(e: _*)
    val a = LabelProp.propagate(df, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == refPropagate(e, 4))
    val b = LabelProp.propagate(df.repartition(7, $"dst"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("fixed rounds pin the oscillating bipartite case deterministically") {
    // a single undirected edge {1,2}: synchronous LPA swaps labels each
    // round — after an EVEN horizon both nodes are back at their own id
    val e = edgesOf((1L, 2L))
    val after4 = LabelProp.propagate(e, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after4 == Map(1L -> 1L, 2L -> 2L))
    val after3 = LabelProp.propagate(e, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after3 == Map(1L -> 2L, 2L -> 1L))
  }

  test("summary sizes total the node count") {
    val e = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val s = LabelProp.summary(edgesOf(e: _*), 4)
    val total = s.agg(sum("sz")).collect().head.getLong(0)
    assert(total == 5)
  }
}
