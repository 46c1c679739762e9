package graft

import graft.etl.Bucketing
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed fact-fact join runs without a shuffle on either side") {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    // the in-memory catalog forgets tables between JVMs but warehouse files
    // persist — clear both before writing
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"target/test-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(dir)
      }
    }
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity"),
      "li_bucketed", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select($"o_orderkey".as("l_orderkey"), $"o_totalprice"),
      "ord_bucketed", "l_orderkey", buckets = 8)
    // disable auto-broadcast so the planner must use SMJ — the property
    // under test is that bucketing satisfies its partitioning requirement
    // (at 100 TB neither fact side is broadcastable anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ in:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
