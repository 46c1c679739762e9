package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the triangle lane's r15 adaptive plan: legacy
  * lineage-recompute shape vs the persisted+measured adaptive shape,
  * run back to back in one JVM on the same dir. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.quietKnownNoise()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[triprobe] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val und = graft.operators.CoPurchase.fullEdges(spark, dir)
    und.write.format("noop").mode("overwrite").save() // warm edge table
    for (round <- 1 to 2) {
      time(s"legacy r$round") {
        graft.operators.Triangles.perNode(und)
          .orderBy(col("n_triangles").desc, col("node")).limit(50)
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.OpCaches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      time(s"adaptive r$round") {
        graft.operators.Triangles.perNodeAdaptive(und)
          .orderBy(col("n_triangles").desc, col("node")).limit(50)
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.OpCaches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      time(s"merge r$round") {
        graft.operators.Triangles.perNodeMerge(und)
          .orderBy(col("n_triangles").desc, col("node")).limit(50)
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.OpCaches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
