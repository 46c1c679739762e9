package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch probe for q_pca_power cross-engine drift: dumps the Spark
  * side's cov / w1 / v1 intermediates to parquet so the DuckDB CTEs can
  * be diffed stage by stage. Args: <dir> <outDir>. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val out = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, dir)
    val cells = e.select(explode(expr(
        "flatten(transform(sequence(0, 63), i -> " +
          "transform(sequence(0, 63), j -> struct(i, j, " +
          "CAST(element_at(embedding, i + 1) AS DOUBLE) " +
          "* CAST(element_at(embedding, j + 1) AS DOUBLE) AS p))))"))
        .as("c"))
      .select($"c.i".as("i"), $"c.j".as("j"), $"c.p".as("p"))
      .groupBy($"i", $"j")
      .agg(sum(round($"p", 12).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("g"),
        count(lit(1)).as("n"))
    val mu = e.select(posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"pos")
      .agg(sum(round($"x".cast(DoubleType), 12).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("sx"))
    val cov = cells
      .join(mu.select($"pos".as("i"), $"sx".as("sxi")), "i")
      .join(mu.select($"pos".as("j"), $"sx".as("sxj")), "j")
      .select($"i", $"j",
        round($"g" / $"n" - ($"sxi" / $"n") * ($"sxj" / $"n"), 8).as("c"))
    val w1 = cov.groupBy($"i")
      .agg(sum(round($"c" * lit(0.125), 10).cast(DecimalType(38, 10)))
        .cast(DoubleType).as("w"))
    cells.coalesce(1).write.mode("overwrite").parquet(s"$out/cells")
    mu.coalesce(1).write.mode("overwrite").parquet(s"$out/mu")
    cov.coalesce(1).write.mode("overwrite").parquet(s"$out/cov")
    w1.coalesce(1).write.mode("overwrite").parquet(s"$out/w1")
    spark.stop()
  }
}
