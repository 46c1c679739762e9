package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the q_bmw serving paths in ONE JVM (alternating, Bench-order
  * teardown between runs): the r18 inline-tf form (weight pass +
  * persist per execution) vs the r19 FromRanked form (materialized
  * champions table + small-frame pins). Args: [dir] [rounds]. */
object BmwAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "tmp/sf1"
    val rounds = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .appName("graft-bmw-ab")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.quietKnownNoise()
    import org.apache.spark.sql.functions._
    graft.plans.GraftExtensions.install(spark)
    def teardown(): Unit = {
      spark.catalog.clearCache()
      graft.operators.OpCaches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      graft.operators.Ckpt.clearAll(spark)
      System.gc()
    }
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"[bmwab] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      teardown()
    }
    def dt = graft.operators.DocTerms.table(spark, dir)
      .withColumn("is_q", col("doc_id") < 8)
    // build the champions table once up front so neither variant's
    // timed window carries it
    graft.operators.HybridSearch.rankedTable(spark, dir).count()
    teardown()
    (1 to rounds).foreach { _ =>
      time("old(tf)") {
        graft.operators.HybridSearch.blockMaxAudit(dt, k = 10, mSeed = 64,
          blockSize = 64)
      }
      time("new(rkd)") {
        graft.operators.HybridSearch.blockMaxAuditFromRanked(
          graft.operators.HybridSearch.rankedTable(spark, dir), dt,
          k = 10, mSeed = 64, blockSize = 64)
      }
    }
    spark.stop()
  }
}
