package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerGroupSpec extends AnyFunSuite with SparkSpec {

  private def windowed = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
  }

  test("rewrite produces the TopK physical operator") {
    GraftExtensions.install(spark)
    val df = windowed
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKFinal") && p.contains("TopKLocal"),
      s"rewrite did not fire:\n$p")
    assert(!p.contains("WindowGroupLimit") && !p.contains("Window ["),
      s"window machinery survived the rewrite:\n$p")
  }

  test("rewritten results are identical to the window formulation") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val rewritten = windowed.collect().map(_.toSeq).toSet
    // reference computation without the rule: rank in the driver
    val reference = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice").collect()
      .groupBy(_.getLong(0)).toSeq
      .flatMap { case (_, rows) =>
        rows.sortBy(r => (-r.getDouble(2), r.getLong(1))).take(3).zipWithIndex
          .map { case (r, i) =>
            Seq[Any](r.getLong(0), r.getLong(1), r.getDouble(2), i + 1) }
      }.toSet
    assert(rewritten == reference)
  }

  test("rule leaves non-top-k windows alone") {
    import spark.implicits._
    GraftExtensions.install(spark)
    // running sum: not a row_number pattern — must keep its Window node
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
    val df = Tables.orders(spark, sf)
      .withColumn("rs", sum($"o_totalprice").over(w))
      .filter($"rs" > 0)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("Window"))
  }
}
