package graft

import graft.operators.BloomJoin
import graft.plans.{Bloom, BloomKernels}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite with SparkSpec {

  test("kernel: added keys always hit; false-positive rate is near the design point") {
    val bits = new Array[Long](1 << 10)          // 65536 bits
    val n = 5000
    (0 until n).foreach(i => BloomKernels.add(bits, i.toLong * 0x9E3779B97F4A7C15L, 5))
    val bytes = BloomKernels.toBytes(bits)
    (0 until n).foreach { i =>
      assert(BloomKernels.mightContain(bytes, i.toLong * 0x9E3779B97F4A7C15L, 5),
        s"inserted key $i missing")                // no false negatives, ever
    }
    val fp = (n until n + 10000)
      .count(i => BloomKernels.mightContain(bytes, i.toLong * 0x9E3779B97F4A7C15L, 5))
    // k=5, n/m ≈ 0.076 → fp ≈ 2.7%; allow generous slack
    assert(fp < 800, s"false-positive rate too high: $fp/10000")
  }

  test("bloom aggregate round-trips through partial aggregation") {
    import spark.implicits._
    val keys = (1L to 2000L).toDF("k").repartition(7)   // force partial merges
    val bloom = keys.agg(Bloom.build(xxhash64($"k")).as("b"))
      .collect().head.getAs[Array[Byte]](0)
    (1L to 2000L).foreach { k =>
      val h = keys.sparkSession.range(1).select(xxhash64(lit(k))).collect().head.getLong(0)
      assert(BloomKernels.mightContain(bloom, h, 5))
    }
  }

  test("bloom semi join equals the plain semi join exactly") {
    import spark.implicits._
    val probe = Tables.customer(spark, sf)
    val build = Tables.orders(spark, sf).filter($"o_totalprice" > 420000)
    val plain = probe.join(build, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    val bloomed = BloomJoin.semiJoin(probe, build, "c_custkey", "o_custkey")
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    assert(bloomed == plain)
  }

  test("probe-side bloom filter sits below the semi join in the plan") {
    import spark.implicits._
    val probe = Tables.customer(spark, sf)
    val build = Tables.orders(spark, sf).filter($"o_totalprice" > 420000)
    val df = BloomJoin.semiJoin(probe, build, "c_custkey", "o_custkey")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("bloom_probe"), s"no bloom filter in plan:\n$p")
    assert(p.contains("LeftSemi"), s"no exact semi join in plan:\n$p")
    // the filter must apply before the semi join consumes the probe side
    val filterIdx = p.indexOf("bloom_probe")
    val joinIdx = p.indexOf("LeftSemi")
    assert(joinIdx < filterIdx, // plan prints top-down: join above filter
      s"bloom filter not below the join:\n$p")
  }
}
