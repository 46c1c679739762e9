package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The write-once materialized co-purchase derivations must be
  * ROW-IDENTICAL to the inline derivations the graph queries used
  * before — parquet round-trip of (long, long) rows is exact, and the
  * build functions are literally the same code, so any divergence here
  * means the materialization itself is broken. */
class CoPurchaseSpec extends AnyFunSuite with SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("materialized full edges equal the inline derivation") {
    val inline = operators.PageRank.coOccurrenceEdges(
      Tables.lineitem(spark, sf), col("l_orderkey"), col("l_partkey"),
      maxBasket = operators.CoPurchase.FullCap)
    val mat = operators.CoPurchase.fullEdges(spark, sf)
    assert(pairs(mat) == pairs(inline))
    assert(pairs(mat).nonEmpty)
  }

  test("materialized sampled edges equal the inline derivation") {
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % operators.CoPurchase.SampleMod === 0)
    val inline = operators.PageRank.coOccurrenceEdges(
      li, col("l_orderkey"), col("l_partkey"),
      maxBasket = operators.CoPurchase.SampleCap)
    val mat = operators.CoPurchase.sampledEdges(spark, sf)
    assert(pairs(mat) == pairs(inline))
    assert(pairs(mat).nonEmpty)
  }

  test("materialized capped items equal the inline derivation") {
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("g"), col("l_partkey").as("i")).distinct()
    val ok = items.groupBy(col("g")).count()
      .filter(col("count") <= operators.CoPurchase.FullCap).select(col("g"))
    val inline = items.join(ok, "g")
    val mat = operators.CoPurchase.items(spark, sf)
    assert(pairs(mat) == pairs(inline))
    assert(pairs(mat).nonEmpty)
  }

  test("consumers read a plain parquet scan (no re-derivation in the plan)") {
    val p = operators.CoPurchase.fullEdges(spark, sf)
      .queryExecution.executedPlan.toString
    // a single file scan, no joins/aggregates — the derivation happened
    // at write time, consumers pay only the derived-table read
    assert(p.contains("FileScan parquet"))
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      s"consumer plan re-derives the edges:\n$p")
  }
}
