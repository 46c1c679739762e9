package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the audit/curation queries added in round 10 (the
  * DuckDB oracle pins exact values; these pin the properties that must
  * hold on ANY input, including inputs the oracle never sees). */
class AuditQueriesSpec extends AnyFunSuite with SparkSpec {

  test("fk audit: zero orphans on the intact star schema, and a planted orphan is found") {
    import spark.implicits._
    val audit = SparkEntry.queries("q_fk_integrity")(spark, sf)
    val orphanTotal = audit.agg(sum($"n_orphans")).collect().head.getLong(0)
    assert(orphanTotal == 0, "driver testdata is referentially intact")
    // plant an orphan: run the same edge logic on a child with a bogus key
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey").limit(10)
      .withColumn("l_orderkey", $"l_orderkey" + 900000000L)
    val orphans = li.join(
      Tables.orders(spark, sf).select($"o_orderkey".as("l_orderkey")).distinct(),
      Seq("l_orderkey"), "left_anti").count()
    assert(orphans == 10)
  }

  test("k-anonymity: generalization monotonicity (coarser level => no more rows at risk)") {
    val rows = SparkEntry.queries("q_k_anonymity")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows("l2_segment") <= rows("l1_nation_segment"))
    assert(rows("l1_nation_segment") <= rows("l0_nation_segment_balband"))
  }

  test("co-occurrence support is symmetric and ranks are dense from 1") {
    import spark.implicits._
    val recs = SparkEntry.queries("q_cooccur_recs")(spark, sf).cache()
    // n_co(a,b) == n_co(b,a) wherever both directions survived the top-5
    val mism = recs.select($"a", $"b", $"n_co")
      .join(recs.select($"b".as("a"), $"a".as("b"), $"n_co".as("n_co2")),
        Seq("a", "b"))
      .filter($"n_co" =!= $"n_co2").count()
    assert(mism == 0)
    // per-item ranks are 1..k with no gaps
    val bad = recs.groupBy($"a")
      .agg(count(lit(1)).as("n"), max($"rank").as("mx"), min($"rank").as("mn"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1).count()
    assert(bad == 0)
    recs.unpersist()
  }

  test("PSI components are symmetric under period swap and zero for identical shares") {
    import spark.implicits._
    // symmetric: (p-q)ln(p/q) is invariant under p<->q — recompute with
    // the period flag inverted and compare
    val base = SparkEntry.queries("q_drift_psi")(spark, sf)
      .select($"bin", $"psi_component")
    val flipped = {
      val binned = Tables.orders(spark, sf)
        .select(expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 2500000")
            .as("bin"),
          (!($"o_orderdate" < lit("1998-01-01").cast("timestamp"))).as("is_a"))
        .groupBy($"bin")
        .agg(sum(when($"is_a", 1L).otherwise(0L)).as("n_a"),
          sum(when(!$"is_a", 1L).otherwise(0L)).as("n_b"))
      val tot = binned.agg(sum($"n_a").as("ta"), sum($"n_b").as("tb"))
      binned.crossJoin(broadcast(tot))
        .select($"bin",
          round((($"n_a" + 1).cast("double") / ($"ta" + 32)
              - ($"n_b" + 1).cast("double") / ($"tb" + 32))
            * log((($"n_a" + 1).cast("double") / ($"ta" + 32))
              / (($"n_b" + 1).cast("double") / ($"tb" + 32))), 8)
            .as("psi_flipped"))
    }
    val diff = base.join(flipped, "bin")
      .filter(abs($"psi_component" - $"psi_flipped") > 1e-7).count()
    assert(diff == 0)
    // all components non-negative ((p-q) and ln(p/q) always share sign)
    val neg = base.filter($"psi_component" < 0).count()
    assert(neg == 0)
  }

  test("bpe queries reconcile: encode totals equal pair-table word mass") {
    import spark.implicits._
    val words = graft.operators.Bpe.wordCounts(
      Tables.documents(spark, sf), $"text")
    val nWords = words.agg(sum($"cnt")).collect().head.getLong(0)
    val enc = SparkEntry.queries("q_bpe_encode")(spark, sf)
      .agg(sum($"n_words"), sum($"n_tokens")).collect().head
    assert(enc.getLong(0) == nWords)
    // tokens never exceed characters and merges never push tokens below
    // one per word
    assert(enc.getLong(1) >= nWords)
    val merges = SparkEntry.queries("q_bpe_merges")(spark, sf).collect()
    assert(merges.length == 10)
    // training transcript frequencies are positive and steps are 1..10
    assert(merges.map(_.getLong(0)).toSeq == (1L to 10L))
    assert(merges.forall(_.getLong(3) > 0))
  }
}
