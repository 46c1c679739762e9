package graft

import graft.etl.Arrivals
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Arriving-file key routing — parity with the reference's per-arrival
  * trigger parsing (state_machine_trigger/lambda_handler.py:65-80). */
class ArrivalsSpec extends AnyFunSuite with SparkSpec {

  test("routes source system, table, partition dir and base name from keys") {
    import spark.implicits._
    val keys = Seq(
      "salesdb/orders/year%3D2024/month%3D03/orders_0001.csv",
      "crm/customer/customer_full.csv",
      "salesdb/orders/").toDF("key")
    val got = keys.select(Arrivals.route($"key").as("r"))
      .select($"r.source_system", $"r.table_name", $"r.file_dir", $"r.base_file_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got(0) == ("salesdb", "orders", "salesdb/orders/year=2024/month=03", "orders_0001.csv"))
    assert(got(1) == ("crm", "customer", "crm/customer", "customer_full.csv"))
    // directory-like key: empty base name (the reference skips these)
    assert(got(2)._4 == "")
  }

  test("routing is row-local — no shuffle in the plan") {
    import spark.implicits._
    val plan = Seq("a/b/c.csv").toDF("key")
      .select(Arrivals.route($"key").as("r"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"routing shuffled:\n$plan")
  }
}
