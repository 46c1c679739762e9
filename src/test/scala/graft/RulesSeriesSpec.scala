package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r15 second-wave lanes — q_lr_auc (rank statistic), q_assoc_rules,
  * q_graph_degrees, q_rolling_corr, q_cross_entropy: the DuckDB oracle
  * pins exact values on the real tables; these pin the DEFINITIONS on
  * fixtures where the expected numbers are computable by hand. */
class RulesSeriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("aucByMidrank: separable 1.0, reversed 0.0, all-ties 0.5, exact 2U") {
    def auc(rows: Seq[(Long, Long)]): (Long, Long, Long, Double, Double) = {
      val r = operators.RankStats
        .aucByMidrank(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    }
    // positives strictly above: ranks 3,4 → 2U = 2(3+4) − 2·3 = 8
    assert(auc(Seq((10L, 0L), (20L, 0L), (30L, 1L), (40L, 1L)))
      == ((2L, 2L, 8L, 1.0, 1.0)))
    // reversed: positives at the bottom → AUC 0
    assert(auc(Seq((10L, 1L), (20L, 1L), (30L, 0L), (40L, 0L)))
      == ((2L, 2L, 0L, 0.0, -1.0)))
    // one tie group holding everything: midrank 2.5, AUC exactly 1/2
    assert(auc(Seq((7L, 1L), (7L, 1L), (7L, 0L), (7L, 0L)))
      == ((2L, 2L, 4L, 0.5, 0.0)))
  }

  test("aucByMidrank: single-class input yields NULL auc/gini (r16 guard)") {
    // n_neg = 0 and n_pos = 0 — AUC undefined; must be an explicit NULL
    // on both engines (Spark's Divide → NULL, DuckDB doubles → ±inf/NaN
    // without the matching CASE in lrAucOracle)
    for (label <- Seq(0L, 1L)) {
      val r = operators.RankStats
        .aucByMidrank(Seq((10L, label), (20L, label)).toDF("s", "y"),
          col("s"), col("y"))
        .collect().head
      assert(r.isNullAt(3) && r.isNullAt(4),
        s"label=$label should give NULL auc/gini, got $r")
    }
  }

  test("assoc rules: exact support/confidence/lift on planted baskets") {
    // baskets 1:(10,20) 2:(10,20) 3:(10,30) 4:(20) → N=4, n10=3, n20=3;
    // only the 10↔20 pair reaches the n_co ≥ 2 floor, in both directions
    val dir = tmpDir("rules_")
    Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
        (3L, 10L), (3L, 30L), (4L, 20L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q_assoc_rules")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rows.size == 2)
    // support = 1e6·2 div 4; confidence = 1e6·2 div 3; lift two-stage
    val expect = (2L, 500000L, 666666L, 888888L)
    assert(rows((10L, 20L)) == expect && rows((20L, 10L)) == expect)
    graft.Fs.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("graph degrees: K3 basket gives one histogram row with 3 wedges") {
    val dir = tmpDir("degs_")
    Seq((1L, 1L), (1L, 2L), (1L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q_graph_degrees")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    // every node has degree 2; wedges = 3 · C(2,2... ) = 3 · (2·1/2) = 3
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 3L, 3L, 3L)))
    graft.Fs.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("rolling corr: proportional series pins 1.0 on every full window") {
    // 20 days, LOW = 2·URGENT → every 14-day window correlates exactly 1
    val dir = tmpDir("rcorr_")
    val base = java.time.LocalDate.parse("1995-01-01")
    (0 until 20).flatMap { i =>
      val d = java.sql.Date.valueOf(base.plusDays(i))
      Seq((d, "1-URGENT", 100.0 + 7 * i), (d, "5-LOW", 2 * (100.0 + 7 * i)))
    }.toDF("o_orderdate", "o_orderpriority", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("q_rolling_corr")(spark, dir).collect()
    assert(rows.length == 7) // days 14..20 carry a full window
    assert(rows.forall(_.getDouble(1) == 1.0))
    graft.Fs.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("rolling corr: a constant series yields NULL, not NaN") {
    val dir = tmpDir("rcorr0_")
    val base = java.time.LocalDate.parse("1995-01-01")
    (0 until 14).flatMap { i =>
      val d = java.sql.Date.valueOf(base.plusDays(i))
      Seq((d, "1-URGENT", 100.0 + i), (d, "5-LOW", 55.0))
    }.toDF("o_orderdate", "o_orderpriority", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("q_rolling_corr")(spark, dir).collect()
    assert(rows.length == 1 && rows.head.isNullAt(1))
    graft.Fs.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("cluster purity: separated label blobs score 1e6 in every cluster") {
    // two far-apart blobs whose label IS the blob id: whatever cells the
    // k=8 quantizer carves, no cell can straddle the blobs, so every
    // cluster's majority label covers all its members exactly
    val dir = tmpDir("purity_")
    val rnd = new scala.util.Random(7)
    (0L until 60L).map { i =>
      val blob = (i % 2).toInt
      val base = if (blob == 0) 10.0f else -10.0f
      (i, Array.fill(8)(base + rnd.nextFloat() * 0.01f), blob)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("q_cluster_purity")(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == 60L)
    assert(rows.forall(_.getLong(4) == 1000000L))
    assert(rows.forall(r => r.getLong(3) == r.getLong(1))) // majority = all
    graft.Fs.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("pr curve: recall monotone nonincreasing, tp bounded by selection") {
    // planted corpus with a clean quality split so the trained model
    // separates: the curve's laws must hold at every threshold
    val dir = tmpDir("prc_")
    val good = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet field toward the distant river bank " +
      "where tall reeds sway gently in the warm evening breeze today"
    (1L to 60L).map { i =>
      if (i % 2 == 0) (i, good + s" extra token$i") else (i, s"x$i")
    }.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_pr_curve")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    // selection and recall shrink (weakly) as the threshold rises
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi._2 <= lo._2 && hi._5 <= lo._5)
      case _ => ()
    }
    rows.foreach { case (_, sel, tp, _, rec) =>
      assert(tp <= sel && rec <= 1000000L)
    }
    graft.Fs.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("cross entropy: hand-computed divergence on a planted split") {
    // plant via the production md5 buckets: train "a a b", test "a c" →
    // V = 3, T_train = 3, smoothed p̂_t(a) = 3/6, p̂_t(c) = 1/6
    val dir = tmpDir("xent_")
    val buckets = (1L to 500L).toDF("id")
      .select($"id", graft.operators.Sampling.hashBucket($"id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val testId = buckets.filter(_._2 < 10).map(_._1).head
    val trainId = buckets.filter(_._2 >= 20).map(_._1).head
    Seq((trainId, "a a b"), (testId, "a c"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")) // DocTerms carries the lang column
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_cross_entropy")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    def r8(x: Double): BigDecimal =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal): Double =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val slt = r8(math.log(3.0 / 6.0)) + r8(math.log(1.0 / 6.0))
    val sle = r8(math.log(1.0 / 2.0)) * 2
    assert(r.getString(0) == "test" && r.getLong(1) == 2L)
    assert(r.getDouble(2) == r6(-slt / 2))
    assert(r.getDouble(3) == r6(-sle / 2))
    assert(r.getDouble(4) == r6((sle - slt) / 2))
    graft.Fs.deleteRec(java.nio.file.Paths.get(dir))
  }
}
