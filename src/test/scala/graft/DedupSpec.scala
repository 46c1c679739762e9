package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docs: DataFrame = Tables.documents(spark, sf)

  /** Ground truth: brute-force word-2-shingle Jaccard >= 0.5 pairs. */
  private lazy val bruteForcePairs: Set[(Long, Long)] = {
    import spark.implicits._
    val sh = docs.select($"doc_id", Dedup.wordShingles($"text", 2).as("s"))
    val a = sh.select($"doc_id".as("id_a"), $"s".as("sh_a"))
    val b = sh.select($"doc_id".as("id_b"), $"s".as("sh_b"))
    a.join(b, $"id_a" < $"id_b")
      .filter(Dedup.jaccard($"sh_a", $"sh_b") >= 0.5)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash LSH finds every brute-force near-dup pair (recall = 1)") {
    import spark.implicits._
    val lsh = Dedup.minhashLshPairs(docs, $"text", $"doc_id",
        shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bruteForcePairs.nonEmpty, "corpus should contain planted near-dups")
    val missed = bruteForcePairs -- lsh
    assert(missed.isEmpty, s"LSH missed ${missed.size}/${bruteForcePairs.size} pairs")
    // and no false positives: every emitted pair passed exact verification
    assert((lsh -- bruteForcePairs).isEmpty)
  }

  test("simhash finds the planted near-dups at small hamming distance") {
    import spark.implicits._
    val sim = Dedup.simhashPairs(docs, $"text", $"doc_id", maxHamming = 3)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash is an approximation: require it to catch most planted pairs
    val caught = bruteForcePairs.intersect(sim)
    assert(caught.size >= bruteForcePairs.size / 2,
      s"simhash caught only ${caught.size}/${bruteForcePairs.size}")
  }

  test("simhash sub-band split is loss-free: every bucket split == no split") {
    import spark.implicits._
    // splitThreshold=2 forces EVERY bucket of >= 3 docs through the 12-bit
    // sub-band path; the pigeonhole argument says output must be identical
    def pairs(t: Int) = Dedup.simhashPairs(docs, $"text", $"doc_id",
        maxHamming = 3, splitThreshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val noSplit = pairs(Int.MaxValue)
    assert(noSplit.nonEmpty)
    assert(pairs(2) == noSplit)
  }

  test("simhash survives a pathological homogeneous corpus (no silent drops)") {
    import spark.implicits._
    // 80 docs that differ only in a short suffix: signatures cluster, so
    // 16-bit band buckets go hot — the old maxBucket cutoff would have
    // dropped them wholesale
    val base = "the quick brown fox jumps over the lazy dog again and again "
    val hom = (0L until 80L).map(i => (i, base * 3 + s"tail$i")).toDF("doc_id", "text")
    def pairs(t: Int) = Dedup.simhashPairs(hom, $"text", $"doc_id",
        maxHamming = 3, splitThreshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val noSplit = pairs(Int.MaxValue)
    assert(noSplit.nonEmpty, "homogeneous corpus should produce near-dup pairs")
    assert(pairs(4) == noSplit, "split output must equal unsplit output")
    // telemetry: the hot buckets are visible, not silent
    val stats = Dedup.simhashBucketStats(hom, $"text", $"doc_id", splitThreshold = 4)
    assert(stats.count() > 0)
  }

  test("minhash hot-bucket sub-blocking keeps the planted near-dups") {
    import spark.implicits._
    // force sub-blocking of every band bucket; planted pairs (J >= 0.8)
    // survive a single-element sub-band with p = 1-(1-J)^4 per band and
    // appear in ~bands buckets — require full recall here, deterministic
    val lsh = Dedup.minhashLshPairs(docs, $"text", $"doc_id",
        shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5,
        splitThreshold = 4)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = bruteForcePairs -- lsh
    assert(missed.size <= bruteForcePairs.size / 10,
      s"sub-blocked LSH missed ${missed.size}/${bruteForcePairs.size} pairs")
    assert((lsh -- bruteForcePairs).isEmpty, "exact verify must kill false positives")
  }

  test("exact dedup keeps one representative per distinct content") {
    import spark.implicits._
    val withDup = docs.select($"doc_id", $"text")
      .union(docs.select($"doc_id" + 10000, $"text").limit(5))
    val groups = Dedup.exactGroups(withDup, $"text", $"doc_id")
    assert(groups.filter($"n_copies" > 1).count() == 5)
    val deduped = Dedup.exact(withDup, $"text", $"doc_id")
    assert(deduped.count() == docs.count())
  }

  test("jaccard of identical sets is 1, disjoint sets is 0") {
    import spark.implicits._
    val df = Seq(
      (Seq("a b", "b c"), Seq("a b", "b c")),
      (Seq("a b"), Seq("x y"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard($"x", $"y").as("j")).collect().map(_.getDouble(0))
    assert(j(0) == 1.0 && j(1) == 0.0)
  }
}
