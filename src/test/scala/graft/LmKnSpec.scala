package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interpolated Kneser–Ney scoring: the closed-form mini-corpus and the
  * probability-mass invariant that defines the smoother. */
class LmKnSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docsDir(texts: Seq[String]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("lmkn_").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("closed-form mini-corpus: P(b|a)=2/3, P(c|a)=1/3 through the KN formula") {
    // bigram types: (a b, c=2), (a c, c=1); ctx a: c_v=3, n1v=2;
    // P_cont(b)=P_cont(c)=1/2; d=0.75:
    //   P(b|a) = 1.25/3 + (1.5/3)(1/2) = 0.6666667
    //   P(c|a) = 0.25/3 + (1.5/3)(1/2) = 0.3333333
    val r = SparkEntry.queries("q_lm_kn")(
      spark, docsDir(Seq("a b", "a b", "a c"))).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(0L) == 0.405465) // -ln(0.66666667) rounded at the 8->6 grid
    assert(r(1L) == 0.405465)
    assert(r(2L) == 1.098612) // -ln(0.33333333)
  }

  test("KN mass invariant: seen-vocabulary probabilities sum to 1 per context") {
    // sum_w P(w|v) = (c_v - d*n1v)/c_v + (d*n1v/c_v) * 1 = 1 — the
    // identity that makes interpolated KN a distribution; verify it by
    // rebuilding the per-bigram probabilities with the query's algebra
    // on a corpus with many contexts
    val dir = docsDir(Seq(
      "the cat sat on the mat", "the dog sat on the rug",
      "a cat and a dog", "the cat the dog the cat"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select($"doc_id",
      graft.functions.TextFns.tokens($"text").as("toks"))
    val bi = toks.select(explode(expr(
      "transform(sequence(1, size(toks) - 1), " +
        "i -> concat(toks[i - 1], ' ', toks[i]))")).as("bg"))
    val types = bi.groupBy($"bg").agg(count(lit(1)).as("c_ab"))
      .withColumn("a", split($"bg", " ").getItem(0))
      .withColumn("b", split($"bg", " ").getItem(1))
    val ctx = types.groupBy($"a")
      .agg(sum($"c_ab").as("c_v"), count(lit(1)).as("n1v"))
    val cont = types.groupBy($"b").agg(count(lit(1)).as("n1w"))
    val nbt = types.agg(count(lit(1)).as("nbt"))
    val mass = types.join(ctx, "a").join(cont, "b")
      .crossJoin(broadcast(nbt))
      .select($"a",
        (($"c_ab".cast("double") - lit(0.75)) / $"c_v"
          + (lit(0.75) * $"n1v" / $"c_v")
            * ($"n1w".cast("double") / $"nbt")).as("p"))
      .groupBy($"a").agg(sum($"p").as("mass"))
      .collect()
    assert(mass.nonEmpty)
    mass.foreach { r =>
      val m = r.getDouble(1)
      // per-context mass = 1 - (d*n1v/c_v)*(1 - sum_seen P_cont); with
      // the FULL seen vocabulary as continuation domain it is exactly 1
      // minus the continuation mass of words never following v — bound
      // it: within (0, 1] and equal to 1 where v precedes every word
      assert(m > 0.0 && m <= 1.0 + 1e-9, s"context ${r.getString(0)}: $m")
    }
    // the invariant proper: total interpolated mass over ALL contexts,
    // completing each context with unseen-continuation terms
    // d*n1v/c_v * P_cont(w) for w not following v, must be 1 per context
    val full = types.select($"a").distinct()
      .crossJoin(cont.select($"b", $"n1w"))
      .join(types.select($"a", $"b", $"c_ab"), Seq("a", "b"), "left")
      .join(ctx, "a").crossJoin(broadcast(nbt))
      .select($"a",
        (coalesce(($"c_ab".cast("double") - lit(0.75)) / $"c_v", lit(0.0))
          + (lit(0.75) * $"n1v" / $"c_v")
            * ($"n1w".cast("double") / $"nbt")).as("p"))
      .groupBy($"a").agg(sum($"p").as("mass")).collect()
    full.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
        s"context ${r.getString(0)} mass ${r.getDouble(1)} != 1")
    }
  }
}
