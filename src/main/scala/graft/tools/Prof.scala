package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling harness: runs named SparkEntry queries repeatedly and
  * prints per-run seconds (and optionally the formatted plan) so perf work
  * is measured, not guessed. Not part of the driver contract.
  *
  * usage: runMain graft.tools.Prof [-explain] [-sf DIR] q_name [q_name...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    var explain = false
    var sfDir = "/root/testdata/sf0.1"
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-explain" => explain = true
        case "-sf" => sfDir = args(i + 1); i += 1
        case n => names += n
      }
      i += 1
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)", "count(distinct id % 100)").collect()

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"PROF $n%-26s run$r ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      cleanup()
    }
    spark.stop()
  }
}
