package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins plans.GramAgg (the r18 q_pca_power optimization) cell-for-cell
  * against the posexplode SQL shape it replaced — nulls, short arrays,
  * and null embeddings included. The aggregate must be a pure physical
  * substitution: same (i, j, g, n) rows, bit-identical doubles. */
class PcaGramSpec extends AnyFunSuite with SparkSpec {

  /** The ORIGINAL explode shape (pre-r18 q_pca_power cells subtree). */
  private def cellsExplode(e: DataFrame): DataFrame = {
    import spark.implicits._
    e.select(posexplode(expr(
        "flatten(transform(sequence(0, 63), i -> " +
          "transform(sequence(0, 63), j -> " +
          "CAST(floor(CAST(element_at(embedding, i + 1) AS DOUBLE) " +
          "* CAST(element_at(embedding, j + 1) AS DOUBLE) " +
          "* 1000000000.0 + 0.5) AS BIGINT))))"))
        .as(Seq("k", "li")))
      .groupBy($"k")
      .agg(sum($"li").as("sli"), count(lit(1)).as("n"))
      .select(expr("k div 64").as("i"), ($"k" % 64).as("j"),
        ($"sli".cast("double") / lit(1000000000.0)).as("g"), $"n")
  }

  /** The NEW aggregate shape (exactly q_pca_power's r18 cells subtree). */
  private def cellsAgg(e: DataFrame): DataFrame = {
    import spark.implicits._
    e.agg(plans.Gram.sums64($"embedding").as("gs"))
      .select(posexplode($"gs.sums").as(Seq("k", "sli")), $"gs.n".as("n"))
      .where($"n" > 0L)
      .select(expr("k div 64").as("i"), ($"k" % 64).as("j"),
        ($"sli".cast("double") / lit(1000000000.0)).as("g"), $"n")
  }

  private def asMap(df: DataFrame): Map[(Long, Long), (Option[Double], Long)] =
    df.collect().map { r =>
      // i/j come out of posexplode arithmetic as Int in both shapes
      (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue()) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getAs[Number](3).longValue())
    }.toMap

  test("GramAgg equals the explode shape on the embeddings table") {
    val e = Tables.embeddings(spark, sf)
    val want = asMap(cellsExplode(e))
    val got = asMap(cellsAgg(e))
    assert(got.size == 4096 && want.size == 4096)
    assert(got == want)
  }

  test("GramAgg matches SQL null semantics: null elements, null rows") {
    import spark.implicits._
    // arrays stay 64-long: ANSI element_at THROWS on short arrays, so
    // the explode shape never tolerated them — short inputs are outside
    // both shapes' domain, not a semantics difference to pin
    val full = (0 until 64).map(i => Some((i + 1).toFloat * 0.01f))
    val rows: Seq[Option[Seq[Option[Float]]]] = Seq(
      Some(full),                                   // clean 64-dim row
      Some(full.updated(3, None).updated(60, None)), // nulls inside
      None,                                          // null embedding
      Some(full.map(v => v.map(x => -x * 1.7f)))     // negatives
    )
    val e = rows.toDF("embedding")
    val want = asMap(cellsExplode(e))
    val got = asMap(cellsAgg(e))
    assert(got == want)
    // n counts every row, null embeddings included (count(1) semantics)
    assert(got.values.forall(_._2 == rows.size))

    // all-null cells: every row is null at index >= 10 → those cells
    // have zero non-null contributions and must read NULL, like sum()
    val sparse: Seq[Option[Seq[Option[Float]]]] =
      Seq(Some(full.zipWithIndex.map { case (v, i) =>
        if (i >= 10) None else v }), None)
    val se = sparse.toDF("embedding")
    val sWant = asMap(cellsExplode(se))
    val sGot = asMap(cellsAgg(se))
    assert(sGot == sWant)
    assert(sGot((63L, 63L))._1.isEmpty && sGot((0L, 0L))._1.nonEmpty)
  }

  test("GramAgg empty-input behavior matches the explode shape (0 rows)") {
    import spark.implicits._
    val e = Seq.empty[Option[Seq[Option[Float]]]].toDF("embedding")
    assert(cellsAgg(e).count() == 0L)
    assert(cellsExplode(e).count() == 0L)
  }
}
