package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot size census of the co-purchase graph at a dir — the
  * numbers that explain what the triangle/PageRank lanes COST there:
  * symmetric edge count m, node count n, oriented wedge volume
  * Σ C(d⁺,2) (the merge/wedge plans' comparison bound) and the
  * adjacency-carry volume Σ_(u,v) (d⁺(u)+d⁺(v)) (the merge plan's
  * join shuffle bound). Usage: runMain graft.tools.GraphStatsProbe [dir]. */
object GraphStatsProbe {
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
    val und = graft.operators.CoPurchase.fullEdges(spark, dir)
    val oriented = graft.operators.CoPurchase.orientedFull(spark, dir)
    val m = und.count()
    val n = und.select(col("src")).distinct().count()
    val deg = oriented.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val row = deg.agg(
      sum(expr("d * (d - 1) div 2")).as("wedges"),
      max(col("d")).as("max_outdeg"),
      sum(col("d")).as("oriented_m")).head()
    // adjacency-carry: each oriented edge (u,v) pulls |N⁺(u)|+|N⁺(v)|
    val carry = oriented
      .join(deg.select(col("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("d").as("dv")), Seq("v"), "left")
      .agg(sum(col("du") + coalesce(col("dv"), lit(0L))).as("carry")).head()
    println(s"[graphstats] dir=$dir m_sym=$m n=$n oriented_m=${row.get(2)} " +
      s"wedges=${row.get(0)} max_outdeg=${row.get(1)} " +
      s"adjacency_carry=${carry.get(0)}")
    spark.stop()
  }
}
