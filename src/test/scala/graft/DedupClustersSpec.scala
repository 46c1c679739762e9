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

  test("convergence telemetry: a chain longer than maxIter reports unconverged") {
    import spark.implicits._
    // path 0-1-2-...-12: Hash-Min moves the min one hop per iteration, so
    // diameter 12 cannot converge in 3 iterations
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val short = DedupClusters.clustersWithStats(chain, $"id_a", $"id_b", maxIter = 3)
    assert(!short.converged && short.iterations == 3)
    // partial labels are still valid reachable ids (never invented)
    short.labels.collect().foreach(r => assert(r.getLong(1) <= r.getLong(0)))
    val full = DedupClusters.clustersWithStats(chain, $"id_a", $"id_b", maxIter = 20)
    assert(full.converged && full.iterations < 20)
    assert(full.labels.collect().forall(_.getLong(1) == 0L), "chain must collapse to 0")
  }

  test("large-star/small-star converges in O(log diameter) and matches Hash-Min") {
    import spark.implicits._
    // a 300-node path: Hash-Min would need ~300 rounds; star rounds are
    // logarithmic — require convergence well under the diameter
    val chain = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val star = DedupClusters.clustersLargeSmallStar(chain, $"id_a", $"id_b", maxIter = 15)
    assert(star.converged, s"did not converge in 15 rounds (ran ${star.iterations})")
    assert(star.iterations <= 12, s"not logarithmic: ${star.iterations} rounds")
    assert(star.labels.collect().forall(_.getLong(1) == 0L), "chain must collapse to 0")
    // random graph: must agree with the Hash-Min labels exactly
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(400)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .toDF("id_a", "id_b")
    val hashMin = DedupClusters.clustersWithStats(edges, $"id_a", $"id_b", maxIter = 50)
    assert(hashMin.converged)
    val got = DedupClusters.clustersLargeSmallStar(edges, $"id_a", $"id_b")
      .labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = hashMin.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
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

  test("rep-graph CC (minhashLshClusters) equals CC over expanded pairs on a clique corpus") {
    import spark.implicits._
    // clique-heavy: 6 copies each of 5 texts (two texts near-dups of each
    // other), one token-less doc, one unique doc — triggers the collapsed
    // path, exercises intra-only cliques, merged cliques, and exclusions
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta iota",
      "one two three four five six seven eight nine ten",
      "lorem ipsum dolor sit amet consectetur adipiscing elit",
      "completely different content about distributed shuffles")
    val rows = for {
      (t, ti) <- texts.zipWithIndex; c <- 0 until 6
    } yield ((ti * 100 + c).toLong, t)
    val corpus = (rows ++ Seq((9000L, "!!! ??? ..."),
      (9100L, "a single unique document with its own words entirely")))
      .toDF("doc_id", "text")
    val viaPairs = DedupClusters.clusters(
        operators.Dedup.minhashLshPairs(corpus, $"text", $"doc_id",
          shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5),
        $"id_a", $"id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaReps = operators.Dedup.minhashLshClusters(corpus, $"text", $"doc_id",
        shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPairs.nonEmpty && viaReps == viaPairs)
  }
}
