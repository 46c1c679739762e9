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

  test("phase-1 heap eviction is loss-free under a tiny group cap") {
    // groups ≫ cap: with maxGroups = 4 over 1000 interleaved groups the
    // kernel must flush constantly, yet the emitted candidate set has to
    // contain every group's true top-k (superset property)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val schema = Seq(AttributeReference("g", LongType, nullable = false)(),
      AttributeReference("v", LongType, nullable = false)())
    val groupProj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(Seq(schema.head), schema)
    val ordering = RowOrdering.create(
      Seq(SortOrder(schema(1), Descending)), schema)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(20000)(
      (rnd.nextInt(1000).toLong, rnd.nextInt(1000000).toLong))
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(schema, schema)
    def run(maxGroups: Int): Seq[(Long, Long)] = {
      val input = rows.iterator.map { case (g, v) =>
        proj(InternalRow(g, v)).copy(): InternalRow }
      graft.plans.TopKHeaps.boundedTopK(
          input, groupProj, ordering, k = 3, maxGroups = maxGroups)
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, vs) =>
      vs.map(_._2).sorted(Ordering[Long].reverse).take(3).map(v => (g, v))
    }.toSet
    // cap far below the group count: flushing happens constantly, yet the
    // candidate set must still contain every group's true top-k
    val tiny = run(maxGroups = 4).toSet
    assert(expected.subsetOf(tiny),
      s"eviction lost ${(expected -- tiny).size} true top-k rows")
    // cap above the group count: no flushing, output is exactly per-group top-k
    val roomy = run(maxGroups = 2048)
    assert(roomy.toSet == expected)
    assert(roomy.size < rows.size, "bounded selection did not prune")
  }

  test("high-cardinality group key (groups ≈ rows) matches the window formulation") {
    import spark.implicits._
    GraftExtensions.install(spark)
    // o_orderkey is near-unique → one group per row: the worst case for
    // any per-group state; results must still match row_number exactly
    val w = Window.partitionBy($"o_orderkey").orderBy($"o_totalprice".desc)
    val df = Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 1)
      .select($"o_orderkey", $"rk")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKFinal"), s"rewrite did not fire:\n$p")
    val n = Tables.orders(spark, sf).select($"o_orderkey").distinct().count()
    assert(df.count() == n)
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
