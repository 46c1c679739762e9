package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timer for the BFS lane (scale diagnosis; not a catalog query). */
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "tmp/sf10"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-bfsprobe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"bfsprobe: $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val li = graft.Tables.lineitem(spark, dir).filter($"l_orderkey" % 50 === 0)
    val edges0 = graft.operators.PageRank.coOccurrenceEdges(
      li, $"l_orderkey", $"l_partkey", maxBasket = 8)
    val edges = t("derive+checkpoint")(edges0.localCheckpoint(true))
    val seeds = t("seeds")(
      edges.select($"src".as("node")).distinct()
        .filter($"node" % 10 === 0).localCheckpoint(true))
    val e = t("bfs-internal-pin")(
      edges.select($"src", $"dst").filter($"src" =!= $"dst").distinct()
        .repartition($"src").localCheckpoint(true))
    var frontier = t("seed-frontier")(
      seeds.select($"node").distinct()
        .select($"node", lit(0L).as("hops")).localCheckpoint(true))
    var settled = frontier
    var h = 1L
    var done = false
    while (h <= 6 && !done) {
      val fr = broadcast(frontier)
      val next = t(s"round$h")(
        e.join(fr, fr("node") === e("src"))
          .select($"dst".as("node")).distinct()
          .join(broadcast(settled), Seq("node"), "left_anti")
          .select($"node", lit(h).as("hops"))
          .localCheckpoint(true))
      done = t(s"round$h-isEmpty")(next.isEmpty)
      if (!done) { settled = settled.unionByName(next); frontier = next }
      h += 1
    }
    t("materialize-output")(
      settled.orderBy($"node").write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
