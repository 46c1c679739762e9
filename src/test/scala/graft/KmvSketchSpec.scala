package graft

import graft.operators.KmvSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite with SparkSpec {

  test("sketch holds the k smallest distinct hashes, bounded at k") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val sk = KmvSketch.sketch(li, $"l_returnflag", $"l_partkey", k = 32)
    val sizes = sk.groupBy($"g").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 32))
    // the sketch values really are the bottom-32 of the full hash set
    val full = li.select($"l_returnflag".as("g"),
        KmvSketch.hv($"l_partkey").as("hv")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"hv")
    val expect = full.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 32).select($"g", $"hv")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = sk.select($"g", $"hv")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("estimates are exact below k and within tolerance above it") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    // l_linenumber has ~7 distinct values << k: estimate must be exact
    val small = KmvSketch.estimates(
      KmvSketch.sketch(li, $"l_returnflag", $"l_linenumber", 64), 64)
    val exact = li.select($"l_returnflag".as("g"), $"l_linenumber").distinct()
      .groupBy($"g").agg(count(lit(1)).as("n"))
    small.join(exact, "g").collect().foreach { r =>
      assert(r.getAs[Double]("est_distinct") == r.getAs[Long]("n").toDouble)
    }
    // l_partkey is high-cardinality: KMV's relative error is ~1/sqrt(k)
    val k = 64
    val big = KmvSketch.estimates(
      KmvSketch.sketch(li, $"l_returnflag", $"l_partkey", k), k)
    val exactBig = li.select($"l_returnflag".as("g"), $"l_partkey").distinct()
      .groupBy($"g").agg(count(lit(1)).as("n"))
    big.join(exactBig, "g").collect().foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val ex = r.getAs[Long]("n").toDouble
      assert(math.abs(est / ex - 1.0) < 5.0 / math.sqrt(k),
        s"group ${r.getString(0)}: est $est vs exact $ex")
    }
  }

  test("merge property: sketch of a union == k-min of unioned sketches") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val lo = li.filter($"l_orderkey" % 2 === 0)
    val hi = li.filter($"l_orderkey" % 2 === 1)
    val k = 48
    // merge the two half-corpus sketches, keep the k smallest
    val merged = KmvSketch.sketch(lo, $"l_returnflag", $"l_partkey", k)
      .select($"g", $"hv")
      .unionByName(KmvSketch.sketch(hi, $"l_returnflag", $"l_partkey", k)
        .select($"g", $"hv"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"hv")
    val rekMerged = merged.withColumn("rk", row_number().over(w))
      .filter($"rk" <= k).select($"g", $"hv")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val whole = KmvSketch.sketch(li, $"l_returnflag", $"l_partkey", k)
      .select($"g", $"hv")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rekMerged == whole)
  }

  test("intersection estimates bracket the exact overlap") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val k = 128
    val sk = KmvSketch.sketch(li, $"l_returnflag", $"l_partkey", k)
    val est = KmvSketch.intersectEstimates(sk, k)
    val keys = li.select($"l_returnflag".as("g"), $"l_partkey".as("key"))
      .distinct()
    val exact = keys.select($"g".as("ga"), $"key")
      .join(keys.select($"g".as("gb"), $"key"), "key")
      .filter($"ga" < $"gb")
      .groupBy($"ga", $"gb").agg(count(lit(1)).as("exact_inter"))
    est.join(exact, Seq("ga", "gb")).collect().foreach { r =>
      val e = r.getAs[Double]("est_inter")
      val x = r.getAs[Long]("exact_inter").toDouble
      assert(x == 0 || math.abs(e / x - 1.0) < 0.5,
        s"pair ${r.getString(0)}/${r.getString(1)}: est $e vs exact $x")
    }
  }

  test("deterministic under repartitioning") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      KmvSketch.sketch(df, $"l_returnflag", $"l_partkey", 64)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(li) == run(li.repartition(13)))
  }
}
