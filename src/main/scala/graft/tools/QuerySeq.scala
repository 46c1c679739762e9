package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc multi-query timer: runs the named SparkEntry queries ONCE
  * each, in order, in one JVM through the Bench noop-sink methodology
  * (construction inside the timed window, cache teardown between
  * queries) — for A/B-ing a shared-derivation change across the set of
  * queries that shares it, without a full Bench run.
  *
  * Args: <q1,q2,...> [dir]
  */
object QuerySeq {
  def main(args: Array[String]): Unit = {
    val qs = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-queryseq")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.quietKnownNoise()
    var total = 0.0
    qs.foreach { q =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      total += s
      println(f"[queryseq] $q%-24s $s%8.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      graft.operators.OpCaches.releaseAll()
    }
    println(f"[queryseq] TOTAL ${total}%.2f s")
    spark.stop()
  }
}
