package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Pins the distributed BPE trainer to a single-threaded reference
  * implementation of the textbook algorithm (symbol lists, no rendered
  * strings), so the rendered-string replace trick is verified against an
  * independent formulation — not against itself. */
class BpeSpec extends AnyFunSuite with SparkSpec {

  // ---- reference implementation: greedy BPE on symbol vectors ----

  /** One greedy left-to-right merge pass (the standard semantics: fuse
    * and skip past the fused token). */
  private def refApply(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refPairCounts(words: Map[Vector[String], Long]): Map[(String, String), Long] =
    words.toSeq.flatMap { case (syms, cnt) =>
      syms.zip(syms.tail).map(p => (p, cnt))
    }.groupMapReduce(_._1)(_._2)(_ + _)

  /** Reference trainer: k rounds of (count pairs, argmax with the
    * (freq DESC, l ASC, r ASC) tiebreak, apply everywhere). */
  private def refTrain(corpus: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var words = corpus.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(String, String, Long)]
    var step = 0
    var stop = false
    while (step < k && !stop) {
      val pc = refPairCounts(words)
      if (pc.isEmpty) stop = true
      else {
        val ((l, r), f) = pc.minBy { case ((l, r), f) => (-f, l, r) }
        out += ((l, r, f))
        words = words.toSeq.map { case (s, c) => (refApply(s, l, r), c) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        step += 1
      }
    }
    out.result()
  }

  private def trainOn(corpus: Map[String, Long], k: Int): Bpe.Model = {
    import spark.implicits._
    val df = corpus.toSeq.toDF("word", "cnt")
    Bpe.train(df, k)
  }

  test("trained merges match the reference trainer on a known corpus") {
    val corpus = Map(
      "lower" -> 5L, "lowest" -> 2L, "newer" -> 6L, "wider" -> 3L,
      "low" -> 7L, "new" -> 4L, "er" -> 1L)
    val got = trainOn(corpus, 8).merges.map(m => (m.left, m.right, m.freq))
    val want = refTrain(corpus, 8)
    assert(got == want)
  }

  test("trained merges match the reference on random corpora") {
    val wordGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.mapOfN(12,
      Gen.zip(wordGen, Gen.chooseNum(1L, 9L)))
    val prop = Prop.forAll(corpusGen) { corpus =>
      corpus.isEmpty ||
        trainOn(corpus, 5).merges.map(m => (m.left, m.right, m.freq)) ==
          refTrain(corpus, 5)
    }
    // each trial runs a full 5-round Spark train: keep the count small
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("rendered-replace merge application equals the reference pass") {
    import spark.implicits._
    // adversarial overlap shapes for (a,a) then (aa,a) style chains
    val words = Seq("aaaa", "aaa", "aabaa", "ababa", "baaab", "a", "b")
    val merges = Seq(
      Bpe.Merge(1, "a", "a", 0L), Bpe.Merge(2, "aa", "a", 0L),
      Bpe.Merge(3, "b", "aa", 0L), Bpe.Merge(4, "a", "b", 0L))
    val got = words.toDF("word")
      .select(col("word"), Bpe.applyMerges(Bpe.render(col("word")), merges).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (w <- words) {
      val ref = merges.foldLeft(w.map(_.toString).toVector)((s, m) =>
        refApply(s, m.left, m.right))
      val wantRendered = ref.map(t => "|" + t + "|").mkString
      assert(got(w) == wantRendered, s"word $w")
    }
  }

  test("token counts shrink monotonically and encode stats are exact") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(200).cache()
    val words = Bpe.wordCounts(docs, col("text"))
    val model = Bpe.train(words, 10)
    assert(model.merges.size == 10)
    // freq sequence is non-increasing only per-pair-generation, but the
    // TOKEN count under progressively more merges is monotone by
    // construction: each merge can only fuse, never split.
    val counts = (0 to model.merges.size).map { k =>
      words.select(sum(col("cnt") *
          Bpe.tokenCount(Bpe.applyMerges(Bpe.render(col("word")),
            model.merges.take(k)))).cast("long"))
        .collect().head.getLong(0)
    }
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"token counts not monotone: $counts")
    // 0 merges ⇒ token count == character count of all words
    val nChars = words.select(sum(col("cnt") * length(col("word"))).cast("long"))
      .collect().head.getLong(0)
    assert(counts.head == nChars)
    // encodeStats totals reconcile with the word table
    val stats = Bpe.encodeStats(docs, col("source"), col("text"), model)
      .agg(sum("n_words").cast("long"), sum("n_tokens").cast("long"))
      .collect().head
    val nWords = words.select(sum("cnt").cast("long")).collect().head.getLong(0)
    assert(stats.getLong(0) == nWords)
    assert(stats.getLong(1) == counts.last)
    docs.unpersist()
  }

  test("training is invariant to input partitioning") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(300)
    val w1 = Bpe.wordCounts(docs, col("text"))
    val w2 = w1.repartition(7, col("cnt"))
    val m1 = Bpe.train(w1, 6).merges
    val m2 = Bpe.train(w2, 6).merges
    assert(m1 == m2)
  }
}
