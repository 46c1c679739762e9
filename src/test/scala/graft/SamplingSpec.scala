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
}
