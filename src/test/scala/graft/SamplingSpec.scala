package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkSpec {

  test("hash split is deterministic and unaffected by partitioning") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    def assignment(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.trainValTest(df, $"doc_id")
        .select($"doc_id", $"split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assignment(docs)
    val b = assignment(docs.repartition(13, $"text"))
    assert(a == b, "split assignment changed under repartitioning")
    assert(a.values.toSet == Set("train", "val", "test"))
    // proportions are roughly 80/10/10 (md5 buckets are uniform-ish)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train frac: $frac")
    assert(frac("test") > 0.04 && frac("test") < 0.16, s"test frac: $frac")
  }

  test("deterministic sample is a stable subset") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val s10 = Sampling.deterministicSample(docs, $"doc_id", 10)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val s20 = Sampling.deterministicSample(docs, $"doc_id", 20)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s20), "pct=10 sample must nest inside pct=20")
    assert(s10.nonEmpty && s20.size > s10.size)
  }

  test("mixture resampling hits target shares and is partitioning-invariant") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val targets = Map("en" -> 0.5, "de" -> 0.15, "es" -> 0.15,
      "fr" -> 0.1, "zh" -> 0.1)
    def kept(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.mixToShares(df, $"lang", $"doc_id", targets)
        .select($"doc_id", $"lang").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = kept(docs)
    assert(a == kept(docs.repartition(13, $"text")),
      "mixture sample changed under repartitioning")
    // achieved shares approach the targets (md5-uniform thinning is
    // binomial — allow generous tolerance at 500 docs)
    val n = a.size.toDouble
    val shares = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    targets.foreach { case (g, t) =>
      assert(math.abs(shares.getOrElse(g, 0.0) - t) < 0.1,
        s"share of $g = ${shares.get(g)} vs target $t (all: $shares)")
    }
    // no group is oversampled: kept count never exceeds available count
    val avail = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.values.groupBy(identity).foreach { case (g, ks) =>
      assert(ks.size <= avail(g))
    }
  }
}
