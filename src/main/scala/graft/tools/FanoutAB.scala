package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for `spark.sql.files.maxPartitionBytes` (r17; VERDICT
  * r16 ask 4 / SCALE.md's deferred round-17 candidate): mid-size
  * derived-table scans (DocTerms ≈ 100–200 MB at sf1) pack into 1–2
  * splits at the default 128 MB, idling 30 of 32 cores on the
  * retrieval lanes' scan stages and making them latency-sensitive when
  * the disk degrades. The conf is a runtime SQL conf, so one JVM can
  * interleave both settings — A,B,A,B per query — and box drift shows
  * up as disagreement between the two A (or two B) samples instead of
  * silently biasing whichever setting ran second.
  *
  * One untimed pass per query first: DerivedCache builds (the DocTerms
  * table itself) are once-per-JVM and must not be charged to either
  * setting. Runs are cold-style otherwise (construction inside the
  * timer, Bench teardown between runs).
  *
  * Args: <q1,q2,...> [dir] [altBytes, default 32m]
  */
object FanoutAB {
  def main(args: Array[String]): Unit = {
    val qs = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val alt = if (args.length > 2) args(2) else "33554432"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // r18 (ADVICE): match Bench/Verify's 8g headroom (triangle lane's
      // broadcast-adjacency collect) so A/Bs stay config-identical
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // keep codegen class names stable across AQE stage renumbering
      // so repeat executions hit the codegen cache (r17; see build.sbt)
      .config("spark.sql.codegen.useIdInClassName", "false")
      .appName("graft-fanout-ab")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.quietKnownNoise()
    val default = spark.conf.get("spark.sql.files.maxPartitionBytes")
    println(s"fanout-ab: default maxPartitionBytes=$default alt=$alt dir=$dir")

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      graft.operators.OpCaches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      graft.operators.Ckpt.clearAll(spark)
      System.gc()
    }
    def run(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      cleanup()
      s
    }
    qs.foreach { q =>
      // untimed build/JIT pass (charged to neither setting)
      run(q)
      val samples = Seq("A" -> default, "B" -> alt, "A2" -> default,
        "B2" -> alt).map { case (tag, v) =>
        spark.conf.set("spark.sql.files.maxPartitionBytes", v)
        val s = run(q)
        println(f"fanout-ab: $q $tag%-3s maxPartitionBytes=$v%-10s ${s}%8.3f s")
        tag -> s
      }.toMap
      spark.conf.set("spark.sql.files.maxPartitionBytes", default)
      val a = (samples("A") + samples("A2")) / 2
      val b = (samples("B") + samples("B2")) / 2
      println(f"fanout-ab: $q SUMMARY default=${a}%.3f s alt=${b}%.3f s " +
        f"ratio=${a / b}%.2fx (A spread ${
          (samples("A") - samples("A2")).abs}%.3f, B spread ${
          (samples("B") - samples("B2")).abs}%.3f)")
    }
    spark.stop()
  }
}
