package graft

import java.sql.Timestamp
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_heaps_law (vocabulary-growth fit) and q_seasonal_decompose
  * (trend/seasonal/residual + 3σ anomalies): closed-form corpora where
  * β and the decomposition are known. */
class HeapsSeasonalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docsDir(texts: Seq[String]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("heaps_").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def dailyDir(values: Seq[Double]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("seas_").toString
    values.zipWithIndex.map { case (v, i) =>
      (Timestamp.valueOf(
        LocalDate.of(1995, 1, 1).plusDays(i).atStartOfDay()), v)
    }.toDF("o_orderdate", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("heaps: a closed vocabulary flattens the curve (beta ~ 0)") {
    val r = SparkEntry.queries("q_heaps_law")(
      spark, docsDir(Seq.fill(100)("alpha beta gamma delta eps")))
      .collect()
    assert(r.head.getAs[Double]("beta") < 0.05)
    assert(r.map(_.getAs[Long]("vocab")).distinct.length == 1)
  }

  test("heaps: all-new words per doc grow linearly (beta ~ 1)") {
    val texts = (0 until 100).map(i =>
      (0 until 5).map(j => s"w${i}x$j").mkString(" "))
    val r = SparkEntry.queries("q_heaps_law")(spark, docsDir(texts))
      .collect()
    assert(r.head.getAs[Double]("beta") > 0.95)
    // deciles are nested prefixes: both curves strictly increase
    val nt = r.map(_.getAs[Long]("n_tokens"))
    val v = r.map(_.getAs[Long]("vocab"))
    assert(nt.sliding(2).forall { case Array(a, b) => b > a })
    assert(v.sliding(2).forall { case Array(a, b) => b > a })
  }

  test("heaps on the real corpus: beta in [0, 1) (closed synthetic vocab => 0)") {
    // the sf0.001 synthetic corpus has a ~31-word vocabulary that is
    // fully covered by the first decile, so its Heaps curve is flat —
    // exactly what the audit should report (beta = 0 means "more data
    // brings no new words here")
    val r = SparkEntry.queries("q_heaps_law")(spark, sf).collect()
    val b = r.head.getAs[Double]("beta")
    assert(b >= 0.0 && b < 1.0, s"beta $b")
    val v = r.map(_.getAs[Long]("vocab"))
    assert(v.sliding(2).forall { case Array(a, c) => c >= a })
  }

  test("seasonal decompose: constant series has zero seasonal/residual, NULL edges") {
    val rows = SparkEntry.queries("q_seasonal_decompose")(
      spark, dailyDir(Seq.fill(30)(420.0))).collect()
    assert(rows.length == 30)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("revenue") == 420.0)
      if (i < 3 || i >= 27) {
        assert(r.isNullAt(r.fieldIndex("trend")), s"day $i edge not NULL")
        assert(r.isNullAt(r.fieldIndex("anomaly")))
      } else {
        assert(r.getAs[Double]("trend") == 420.0)
        assert(r.getAs[Double]("residual") == 0.0)
        assert(r.getAs[Long]("anomaly") == 0L)
      }
      assert(r.getAs[Double]("seasonal") == 0.0)
    }
  }

  test("seasonal decompose: one planted spike is the only anomaly") {
    val vals = Seq.tabulate(64)(i => if (i == 33) 5000.0 else 100.0)
    val rows = SparkEntry.queries("q_seasonal_decompose")(
      spark, dailyDir(vals)).collect()
    val flagged = rows.zipWithIndex.filter { case (r, _) =>
      !r.isNullAt(r.fieldIndex("anomaly")) && r.getAs[Long]("anomaly") == 1L
    }.map(_._2)
    assert(flagged.toSeq == Seq(33), s"anomalies at ${flagged.toSeq}")
  }

  test("seasonal decompose: dow components absorb the spike and net to ~0") {
    val vals = (0 until 70).map(i => if (i % 7 == 0) 1000.0 else 100.0)
    val rows = SparkEntry.queries("q_seasonal_decompose")(
      spark, dailyDir(vals)).collect()
    val comps = rows.map(_.getAs[Double]("seasonal")).distinct.sorted
    // a perfectly weekly pattern collapses to two components: the
    // spike weekday and the shared off-day value
    assert(comps.length == 2, s"components $comps")
    assert(comps.last > 700.0, s"spike component ${comps.last}")
    // ...and the re-centering makes one calendar week net to ~0
    assert(math.abs(rows.take(7).map(_.getAs[Double]("seasonal")).sum) < 5.0,
      "seasonal components over one week must net to ~0")
  }
}
