package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite with SparkSpec {

  /** The definition: rows with no strict dominator (anti-join form). */
  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val p = df.select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val q = p.select(col("p_partkey").as("qk"),
      col("p_retailprice").as("qp"), col("p_size").as("qs"))
    p.join(q,
        col("qp") <= col("p_retailprice") && col("qs") >= col("p_size") &&
        (col("qp") < col("p_retailprice") || col("qs") > col("p_size")),
        "left_anti")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
  }

  test("level-minima reduction equals naive dominance on the part table") {
    import spark.implicits._
    val part = Tables.part(spark, sf)
    val got = Skyline.frontier2d(part, $"p_retailprice", $"p_size")
      .select($"p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == naive(part), s"skyline mismatch")
  }

  test("equal points survive together; dominated duplicates both drop") {
    import spark.implicits._
    val df = Seq(
      (1L, 5.0, 10), (2L, 5.0, 10),   // tied pair on the frontier
      (3L, 5.0, 9),                   // dominated by 1/2 (same cost, less benefit)
      (4L, 4.0, 10),                  // dominates 1/2 → they drop
      (5L, 9.0, 12)                   // frontier (bigger size)
    ).toDF("p_partkey", "p_retailprice", "p_size")
    val got = Skyline.frontier2d(df, $"p_retailprice", $"p_size")
      .select($"p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == Set(4L, 5L), s"got $got")
    // remove the dominator: the tie pair resurfaces together
    val got2 = Skyline.frontier2d(df.filter($"p_partkey" =!= 4L),
        $"p_retailprice", $"p_size")
      .select($"p_partkey").collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1L, 2L, 5L), s"got $got2")
  }

  test("single row is its own frontier") {
    import spark.implicits._
    val df = Seq((7L, 1.0, 1)).toDF("p_partkey", "p_retailprice", "p_size")
    assert(Skyline.frontier2d(df, $"p_retailprice", $"p_size").count() == 1)
  }
}
