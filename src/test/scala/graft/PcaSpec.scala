package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA power iteration: planted-direction recovery, unit norm, and the
  * isotropy reading on the real corpus. */
class PcaSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def embDir(rows: Seq[(Long, Array[Float])]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("pca_").toString
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("a planted dominant axis is recovered with ~all the variance") {
    // dim 0 carries variance ~200x any other dimension
    val rows = (0 until 50).map { i =>
      val v = new Array[Float](64)
      v(0) = i.toFloat / 10.0f
      for (j <- 1 until 64) v(j) = ((i * j) % 7).toFloat / 100.0f
      (i.toLong, v)
    }
    val out = SparkEntry.queries("q_pca_power")(spark, embDir(rows))
      .collect()
    val load = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(load(0L)) > 0.99,
      s"dominant axis not recovered: ${load(0L)}")
    assert(out.head.getDouble(3) > 900000.0,
      s"explained_ppm ${out.head.getDouble(3)} below 90%")
  }

  test("the loading vector is unit length on the real corpus") {
    val out = SparkEntry.queries("q_pca_power")(spark, sf).collect()
    assert(out.length == 64)
    val norm = math.sqrt(out.map(r => {
      val v = r.getDouble(1); v * v
    }).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"||v|| = $norm")
    // eigenvalue positive, explained share sane, constant across rows
    assert(out.head.getDouble(2) > 0.0)
    val shares = out.map(_.getDouble(3)).distinct
    assert(shares.length == 1 && shares.head > 0.0 && shares.head < 1000000.0)
  }

  test("isotropic real embeddings: PC1 explains only a few percent") {
    // pins SCALE.md's isotropy measurement (the ANN frontier's
    // geometry bound): no dominant direction in the synthetic corpus
    val out = SparkEntry.queries("q_pca_power")(spark, sf).collect()
    assert(out.head.getDouble(3) < 300000.0,
      s"corpus unexpectedly anisotropic: ${out.head.getDouble(3)} ppm")
  }
}
