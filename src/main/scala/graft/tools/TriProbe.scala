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
    // SPARK_GRAFT_TRI_SHAPES: comma list of shapes to run (default all)
    // — at sf1+ the legacy wedge plan alone costs minutes, so focused
    // A/Bs pick e.g. "merge,served"
    val shapes = sys.env.get("SPARK_GRAFT_TRI_SHAPES")
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("legacy", "adaptive", "merge", "served"))
    def ifShape(s: String)(f: => Unit): Unit = if (shapes.contains(s)) f
    val und = graft.operators.CoPurchase.fullEdges(spark, dir)
    und.write.format("noop").mode("overwrite").save() // warm edge table
    for (round <- 1 to 2) {
      def teardown(): Unit = {
        graft.operators.OpCaches.releaseAll()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        // the Bench cleanup() discipline: released broadcasts (the
        // merge plan's ~GB hashed adjacency relations) are reclaimed
        // only when their weak refs are GC'd — without this, round 2
        // of the broadcast shape measured 20× round 1 (309 s vs 15 s)
        // purely from heap pressure of round 1's dead relations
        System.gc()
      }
      ifShape("legacy") {
        time(s"legacy r$round") {
          graft.operators.Triangles.perNode(und)
            .orderBy(col("n_triangles").desc, col("node")).limit(50)
            .write.format("noop").mode("overwrite").save()
        }
        teardown()
      }
      ifShape("adaptive") {
        time(s"adaptive r$round") {
          graft.operators.Triangles.perNodeAdaptive(und)
            .orderBy(col("n_triangles").desc, col("node")).limit(50)
            .write.format("noop").mode("overwrite").save()
        }
        teardown()
      }
      ifShape("merge") {
        time(s"merge r$round") {
          graft.operators.Triangles.perNodeMerge(und)
            .orderBy(col("n_triangles").desc, col("node")).limit(50)
            .write.format("noop").mode("overwrite").save()
        }
        teardown()
      }
      // r16: the catalog lane's shape — merge plan over the
      // MATERIALIZED oriented/adjacency parquet (checked kernel,
      // nullable-typed arrays); first round pays the derived build
      ifShape("served") {
        time(s"served r$round") {
          val o = graft.operators.CoPurchase.orientedFull(spark, dir)
          val a = graft.operators.CoPurchase.triAdjacency(spark, dir)
          graft.operators.Triangles.perNodeMergeAuto(o, a)
            .orderBy(col("n_triangles").desc, col("node")).limit(50)
            .write.format("noop").mode("overwrite").save()
        }
        teardown()
        // the shuffle shape of the same serving plan, for the A/B
        time(s"servedShuf r$round") {
          val o = graft.operators.CoPurchase.orientedFull(spark, dir)
          val a = graft.operators.CoPurchase.triAdjacency(spark, dir)
          graft.operators.Triangles.perNodeMergeOn(o, a, broadcastAdj = false)
            .orderBy(col("n_triangles").desc, col("node")).limit(50)
            .write.format("noop").mode("overwrite").save()
        }
        teardown()
      }
    }
    spark.stop()
  }
}
