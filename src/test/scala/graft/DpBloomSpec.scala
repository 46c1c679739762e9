package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_dp_hist (seeded SIMULATION of a Laplace release — not a DP
  * mechanism; see the lane doc) and q_bloom_fpr (bloom calibration):
  * the DuckDB oracle pins exact values; these pin the statistical laws
  * the two audits exist to demonstrate, on inputs sized so the laws
  * have teeth. */
class DpBloomSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dp hist: deterministic by seed, noisy everywhere, |noise| ~ Laplace(b=2)") {
    val a = SparkEntry.queries("q_dp_hist")(spark, sf).collect()
    val b = SparkEntry.queries("q_dp_hist")(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "release must be deterministic by seed")
    val noises = a.map(r =>
      math.abs(r.getAs[Double]("n_noisy") - r.getAs[Long]("n_true")))
    // u is strictly inside (0,1): noise is finite and (a.s.) nonzero
    assert(noises.forall(n => n > 0 && n < 50))
    // E|X| = b = 2 for Laplace(2); 25 draws keep the mean loosely near it
    val mean = noises.sum / noises.length
    assert(mean > 0.4 && mean < 8.0, s"mean |noise| $mean implausible for b=2")
  }

  test("dp hist: sim_epsilon metadata constant and true counts preserved") {
    val rows = SparkEntry.queries("q_dp_hist")(spark, sf).collect()
    // the column is named sim_epsilon because the lane is a seeded
    // SIMULATION of a Laplace release, not a DP mechanism (see lane doc)
    assert(rows.forall(_.getAs[Double]("sim_epsilon") == 0.5))
    val total = rows.map(_.getAs[Long]("n_true")).sum
    assert(total == Tables.customer(spark, sf).count())
  }

  test("bloom fpr: the m=8n/k=4 sizing law holds on a 2000-key fixture") {
    val dir = java.nio.file.Files
      .createTempDirectory("bloom_fpr_").toString
    (1L to 2000L).map(k =>
        (k, if (k <= 500) "BUILDING" else "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    val r = SparkEntry.queries("q_bloom_fpr")(spark, dir).collect().head
    assert(r.getAs[Long]("n_members") == 500L)
    assert(r.getAs[Long]("m_bits") == 4000L)
    // fill: theory 393469 ppm, binomial sd ≈ 1.2% of m — pin ±4%
    val fill = r.getAs[Long]("fill_ppm")
    assert(fill > 378000L && fill < 409000L, s"fill $fill ppm off the law")
    // fpr: theory ≈ 23969 ppm over 1500 probes (sd ≈ 4000 ppm) — pin a
    // generous 3-sigma-ish bracket; 0 or >3x would mean broken hashing
    val fpr = r.getAs[Long]("fpr_ppm")
    assert(fpr > 8000L && fpr < 55000L, s"fpr $fpr ppm off the law")
  }

  test("bloom fpr: position hashing saturates when the filter is undersized") {
    // 40 members -> m = 320 bits, but probe keys collide into a ~39%-
    // full filter; with only 4 distinct probe keys the count just has
    // to be sane — the REAL assertion is fp <= n_probes and ppm bounds
    val dir = java.nio.file.Files
      .createTempDirectory("bloom_sat_").toString
    (1L to 240L).map(k =>
        (k, if (k <= 40) "BUILDING" else "AUTOMOBILE"))
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    val r = SparkEntry.queries("q_bloom_fpr")(spark, dir).collect().head
    assert(r.getAs[Long]("false_pos") <= r.getAs[Long]("n_probes"))
    assert(r.getAs[Long]("fill_ppm") <= 1000000L)
    assert(r.getAs[Long]("n_set_bits") <= math.min(320L, 4L * 40L))
  }
}
