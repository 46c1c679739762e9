package graft

import graft.operators.DedupClusters
import org.scalatest.funsuite.AnyFunSuite

class DedupClustersSpec extends AnyFunSuite with SparkSpec {

  test("label propagation finds connected components") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, singleton edge {20,20}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 20L))
      .toDF("id_a", "id_b")
    val got = DedupClusters.clusters(pairs, $"id_a", $"id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("clusters over real minhash pairs are internally consistent") {
    import spark.implicits._
    val pairs = operators.Dedup.minhashLshPairs(
      Tables.documents(spark, sf), $"text", $"doc_id",
      shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5)
    val clustered = DedupClusters.clusters(pairs, $"id_a", $"id_b")
    val label = clustered.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every pair's endpoints must share a cluster, labels are cluster minima
    pairs.select($"id_a", $"id_b").collect().foreach { r =>
      assert(label(r.getLong(0)) == label(r.getLong(1)))
    }
    label.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.keys.min == cl, s"cluster $cl label is not its minimum")
    }
  }
}
