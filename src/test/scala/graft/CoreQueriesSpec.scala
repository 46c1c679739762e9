package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every catalog query runs and returns rows at sf0.001; spot-checks on
  * values the DuckDB oracle also pins at sf0.01. */
class CoreQueriesSpec extends AnyFunSuite with SparkSpec {

  test("every SparkEntry query executes and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q1 aggregates sum in decimal, emit double") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    // internal sums are DecimalType (exact regardless of partitioning/order);
    // the OUTPUT is double for cross-engine hash parity (see SparkEntry doc)
    assert(df.schema("sum_qty").dataType == org.apache.spark.sql.types.DoubleType)
    val row = df.filter("l_returnflag = 'A' AND l_linestatus = 'F'").collect().head
    assert(row.getAs[Double]("sum_qty") > 0)
    assert(row.getAs[Long]("count_order") > 0)
  }

  test("window top-k never exceeds k per group") {
    import spark.implicits._
    val perCust = SparkEntry.queries("q_window_topk")(spark, sf)
      .groupBy($"o_custkey").count().filter($"count" > 3).count()
    assert(perCust == 0)
  }

  test("salted aggregation equals direct groupBy") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy($"l_suppkey")
      .agg(sum($"l_quantity".cast(DecimalType(18, 2))).as("total_qty"))
    val salted = operators.SkewAgg.saltedSum(li, Seq($"l_suppkey"),
      $"l_quantity".cast(DecimalType(18, 2)), $"l_orderkey", "total_qty")
    assert(direct.join(salted, "l_suppkey")
      .filter(direct("total_qty") =!= salted("total_qty")).count() == 0)
  }

  test("sessionize: session bounds respect the gap") {
    import spark.implicits._
    val s = SparkEntry.queries("q_events_sessionize")(spark, sf)
    // within a session, end - start is finite and events >= 1
    assert(s.filter($"session_end" < $"session_start").count() == 0)
    assert(s.filter($"n_events" < 1).count() == 0)
  }
}
