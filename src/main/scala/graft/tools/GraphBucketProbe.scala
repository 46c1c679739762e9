package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the co-located graph-iteration claim (SCALE.md): run
  * the SAME integer PageRank over (a) the co-purchase edge table as
  * plain parquet — every round's edge-side join re-shuffles or reuses an
  * Exchange — and (b) the same edges written BUCKETED BY src with the
  * bucket count matched to shuffle.partitions, where the scan itself
  * satisfies the join's hashpartitioning requirement, so rounds pay only
  * the rank-side and aggregation shuffles.
  *
  * Reports per-lane wall time, the Exchange / ReusedExchange node counts
  * of the executed plan, and pins the two lanes' top-100 ranks
  * identical (integer arithmetic — any layout effect on values is a bug).
  *
  * Usage: runMain graft.tools.GraphBucketProbe [sfDir] [buckets] [iters]
  */
object GraphBucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val buckets = if (args.length > 1) args(1).toInt else 32
    val iters = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", buckets)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "tmp/gbp_warehouse")
      .config("spark.ui.enabled", "false")
      .appName("graft-graph-bucket-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.quietKnownNoise()
    import spark.implicits._

    // a fresh metastore can't adopt a previous run's table location —
    // clear the probe's warehouse before (re)creating the bucketed table
    graft.Fs.deleteRec(new java.io.File("tmp/gbp_warehouse"))

    // one derivation feeds both lanes
    val edges = graft.operators.PageRank.coOccurrenceEdges(
      spark.read.parquet(s"$sfDir/lineitem.parquet"),
      $"l_orderkey", $"l_partkey", maxBasket = 64)
    val plainDir = "tmp/gbp_edges_plain"
    edges.write.mode("overwrite").parquet(plainDir)
    graft.etl.Bucketing.writeBucketed(
      spark.read.parquet(plainDir), "gbp_edges_bucketed", "src", buckets)

    def lane(label: String, e: org.apache.spark.sql.DataFrame)
        : Set[(Long, Long)] = {
      val t0 = System.nanoTime()
      val df = graft.operators.PageRank.ranks(e, iterations = iters)
        .orderBy($"rank_micro".desc, $"node").limit(100)
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val s = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      println(f"[gbp] $label%-9s $s%7.1f s  Exchange=$ex  ReusedExchange=$reused")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      graft.operators.OpCaches.releaseAll()
      rows
    }

    val a = lane("shuffled", spark.read.parquet(plainDir))
    val b = lane("bucketed", spark.table("gbp_edges_bucketed"))
    println(s"[gbp] top-100 identical: ${a == b}")
    spark.stop()
  }
}
