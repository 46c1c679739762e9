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
    // print every stage that takes > 1 s wall with its name/site
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for {
            a <- i.completionTime; b <- i.submissionTime
          } yield a - b).getOrElse(0L)
          if (ms > 1000)
            println(f"  [stage ${i.stageId}%4d] ${ms / 1000.0}%7.1f s  " +
              s"${i.name.take(90)}  tasks=${i.numTasks}")
        }
      })
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"probe: $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docsAll = graft.Tables.documents(spark, dir)
    // ~2,500-doc sample: doc_pct is a PERCENTAGE applied via
    // hashBucket < pct below, so kept docs ≈ n · pct / 100 =
    // SampleDocs. (r16 ADVICE: the old bare `250000 div count(1)`
    // read as a 250k-doc cap — the probe has always run on ~2.5k
    // docs, which is the intent: stage-shape timing, not load.)
    val SampleDocs = 2500L
    val pct = docsAll.agg(
      expr(s"least(100, greatest(1, (${SampleDocs} * 100) div count(1)))")
        .as("doc_pct"))
    val sh = docsAll.crossJoin(broadcast(pct))
      .filter(graft.operators.Sampling.hashBucket($"doc_id") < $"doc_pct")
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
    // inside the PPJoin: which stage of verifiedPairs costs
    val th = 0.5
    val allSets = sets.persist()
    t("sets count")(println("  rows=" + allSets.count()))
    val prefixes = allSets.select(col("doc_id"), col("sz"),
      posexplode(slice(col("tokens"), lit(1),
        (col("sz") - ceil(lit(th) * col("sz")) + 1).cast("int"))))
      .withColumnRenamed("pos", "p")
      .withColumnRenamed("col", "token")
      .withColumn("p", col("p") + 1)
    t("prefixes")(println("  rows=" + prefixes.count()))
    val cand2 = prefixes.as("a").join(prefixes.as("b"),
        col("a.token") === col("b.token") &&
        col("a.doc_id") < col("b.doc_id") &&
        least(col("a.sz"), col("b.sz")).cast("double") >=
          lit(th) * greatest(col("a.sz"), col("b.sz")))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sz").as("sa"), col("b.sz").as("sb"))
      .agg(min(col("a.p")).as("ia"), min(col("b.p")).as("jb"))
      .filter((lit(1) + least(col("sa") - col("ia"), col("sb") - col("jb")))
        .cast("double") >=
        lit(th / (1.0 + th)) * (col("sa") + col("sb")))
      .select(col("id_a"), col("id_b"))
    t("ppjoin cand")(println("  rows=" + cand2.count()))
    val ver = cand2
      .join(allSets.select(col("doc_id").as("id_a"), col("tokens").as("ta"),
        col("sz").as("sa")), "id_a")
      .join(allSets.select(col("doc_id").as("id_b"), col("tokens").as("tb"),
        col("sz").as("sb")), "id_b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .filter(col("inter").cast("double") /
        (col("sa") + col("sb") - col("inter")) >= th)
    t("verify")(println("  rows=" + ver.count()))
    spark.stop()
  }
}
