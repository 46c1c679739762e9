package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass entropy kernel must equal the shuffled relational
  * spelling (explode → groupBy(doc, token) → join → groupBy(doc)) it
  * replaces — same rounding recipe, so row-for-row equality including
  * the doubles, on the real documents table. */
class TextEntropySpec extends AnyFunSuite with SparkSpec {

  test("kernel equals the shuffled relational spelling row-for-row") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val kernel = docs
      .filter(size(TextFns.tokens($"text")) > 0)
      .select($"doc_id",
        plans.TextKernels.tokenEntropy(TextFns.tokens($"text")).as("s"))
      .select($"doc_id", $"s.n_tokens", $"s.vocab", $"s.entropy_nats")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val cnt = docs
      .select($"doc_id", explode(TextFns.tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy($"doc_id")
      .agg(sum($"n").as("t"), count(lit(1)).as("vocab"))
    val shuffled = cnt.join(tot, "doc_id")
      .select($"doc_id", $"t", $"vocab",
        round(($"n".cast(DoubleType) / $"t") * log($"n".cast(DoubleType) / $"t"), 8)
          .cast(DecimalType(18, 8)).as("term"))
      .groupBy($"doc_id")
      .agg(first($"t").as("n_tokens"), first($"vocab").as("vocab"),
        round(-sum($"term").cast(DoubleType), 6).as("entropy_nats"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    assert(kernel == shuffled,
      s"diverge: onlyKernel=${(kernel -- shuffled).take(3)} " +
        s"onlyShuffled=${(shuffled -- kernel).take(3)}")
    assert(kernel.nonEmpty)
  }

  test("degenerate inputs: single token, uniform tokens, empty handled upstream") {
    import spark.implicits._
    val df = Seq((1L, Seq("a")), (2L, Seq("a", "a", "a")),
        (3L, Seq("a", "b", "c", "d")))
      .toDF("id", "toks")
      .select($"id", plans.TextKernels.tokenEntropy($"toks").as("s"))
      .select($"id", $"s.n_tokens", $"s.vocab", $"s.entropy_nats")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(df(1L) == ((1L, 1L, 0.0)))   // one token: zero entropy
    assert(df(2L) == ((3L, 1L, 0.0)))   // uniform repeats: zero entropy
    // 4 equiprobable tokens: ln(4) = 1.386294…
    assert(df(3L)._1 == 4L && df(3L)._2 == 4L)
    assert(math.abs(df(3L)._3 - math.log(4)) < 1e-5)
  }
}
