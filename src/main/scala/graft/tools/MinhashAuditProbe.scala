package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of q_minhash_recall's subtrees — which of
  * (shingle distinct, signature agg, truth PPJoin, band joins) actually
  * costs. Args: [dir]. Dev harness, not part of the driver contract. */
object MinhashAuditProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"probe: $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val sh = graft.Tables.documents(spark, dir)
      .select($"doc_id", graft.functions.TextFns.tokens($"text").as("toks"))
      .select($"doc_id",
        explode(graft.operators.Dedup.wordShinglesOf($"toks", 2)).as("sh0"))
      .distinct()
      .persist()
    t("sh distinct")(println("  rows=" + sh.count()))
    val mins = (0 until 16).map(i => min(expr(
      s"cast(conv(substring(md5(concat('$i:', sh0)), 1, 8), 16, 10) as bigint)"))
      .as(s"m$i"))
    val mh = sh.groupBy($"doc_id").agg(mins.head, mins.tail: _*).persist()
    t("mh signatures")(println("  rows=" + mh.count()))
    val shDf = sh.groupBy($"sh0").agg(count(lit(1)).as("df"))
    val sets = sh.join(shDf, "sh0")
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"df", $"sh0"))).as("ord"))
      .select($"doc_id", expr("transform(ord, x -> x.sh0)").as("tokens"),
        size($"ord").as("sz"))
    val truth = graft.operators.AllPairs
      .jaccardJoinFromSets(sets, threshold = 0.5)
      .select($"id_a", $"id_b").persist()
    t("truth ppjoin")(println("  rows=" + truth.count()))
    Seq(2, 4, 8).foreach { bands =>
      val r = 16 / bands
      val perBand = (0 until bands).map { j =>
        val key = concat_ws("|",
          ((j * r) until ((j + 1) * r)).map(i => col(s"m$i").cast("string")): _*)
        mh.select($"doc_id", lit(j).as("band"), key.as("bk"))
      }.reduce(_ unionAll _)
      val cand = perBand.as("x")
        .join(perBand.as("y"),
          col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      t(s"cand b=$bands")(println("  rows=" + cand.count()))
    }
    spark.stop()
  }
}
