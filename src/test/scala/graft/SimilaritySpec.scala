package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  test("semanticDedup: collapsed clique path is output-identical to naive") {
    import spark.implicits._
    val base = Tables.embeddings(spark, sf).filter($"vec_id" < 100)
    val m = graft.operators.IvfAnn.train(base, "vec_id", "embedding", k = 4)
    // 5 exact copies of each vector (shifted ids) -> duplicates dominate
    // (100 distinct / 500 rows), so the operator takes the collapsed
    // path; the expected result is an independent naive cell-self-join
    // replay below.
    val dup = (0 until 5).map(i => base.select(
      ($"vec_id" + org.apache.spark.sql.functions.lit(i * 1000L))
        .as("vec_id"), $"embedding")).reduce(_ unionAll _)
    val out = Similarity.semanticDedup(dup, m, threshold = 0.3)
      .orderBy($"vec_id").collect()
    // independent naive replay (cell self-join), no collapse
    val a = dup.select($"vec_id", $"embedding",
      graft.operators.IvfAnn.assignCell($"embedding", m).as("cell"))
    val pairs = a.select($"vec_id".as("id_a"), $"embedding".as("emb_a"), $"cell")
      .join(a.select($"vec_id".as("id_b"), $"embedding".as("emb_b"), $"cell"),
        Seq("cell"))
      .filter($"id_a" < $"id_b")
      .filter(graft.functions.VectorFns.cosine6($"emb_a", $"emb_b") >= 0.3)
    val dupOf = pairs.groupBy($"id_b".as("vec_id"))
      .agg(org.apache.spark.sql.functions.min($"id_a").as("dup_of"))
    val naive = a.select($"vec_id", $"cell".cast("long").as("cell"))
      .join(dupOf, Seq("vec_id"), "left")
      .select($"vec_id", $"cell",
        org.apache.spark.sql.functions.coalesce($"dup_of",
          org.apache.spark.sql.functions.lit(-1L)).as("dup_of"),
        $"dup_of".isNull.as("kept"))
      .orderBy($"vec_id").collect()
    assert(out.length == naive.length)
    out.zip(naive).foreach { case (c, n) => assert(c == n, s"$c != $n") }
    graft.operators.OpCaches.releaseAll()
  }

  test("brute-force top-k returns exactly k ranked neighbors per query") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val topk = Similarity.bruteForceTopK(e.filter($"vec_id" < 5), e, k = 3)
    val counts = topk.groupBy($"query_id").count().collect()
    assert(counts.length == 5 && counts.forall(_.getLong(1) == 3))
    // ranks are 1..k and cosine non-increasing within a query
    val byQuery = topk.orderBy($"query_id", $"rank").collect()
      .groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rows =>
      val cos = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-1 recall vs brute force is reasonable") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 50)
    val exact = Similarity.bruteForceTopK(q, e, k = 1)
      .select($"query_id", $"cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = Similarity.lshTopK(q, e, k = 1, nPlanes = 4, probeRadius = 0)
      .select($"query_id", $"cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val multi = Similarity.lshTopK(q, e, k = 1, nPlanes = 4, probeRadius = 2)
      .select($"query_id", $"cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recall(m: Map[Long, Long]): Int =
      exact.count { case (qid, cid) => m.get(qid).contains(cid) }
    // multi-probe must materially beat single-probe and clear a floor
    assert(recall(multi) > recall(single),
      s"multi-probe (${recall(multi)}) should beat single-probe (${recall(single)})")
    assert(recall(multi) >= exact.size / 5,
      s"LSH top-1 recall too low: ${recall(multi)}/${exact.size}")
  }

  test("cosineNearDupPairs equals a driver-side bucket+verify reference") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf).filter($"vec_id" % 5 === 0)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val planes = Similarity.hyperplanes(6, 64)
    def bucket(v: Array[Float]): Long = {
      var b = 0L
      planes.indices.foreach { p =>
        var dot = 0.0
        v.indices.foreach(j => dot += v(j).toDouble * planes(p)(j))
        if (dot >= 0) b |= (1L << p)
      }
      b
    }
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib
      if java.lang.Long.bitCount(bucket(va) ^ bucket(vb)) <= 1
      if cos6(va, vb) >= 0.3
    } yield (ia, ib)).toSet
    val got = Similarity.cosineNearDupPairs(Tables.embeddings(spark, sf),
        threshold = 0.3, sampleMod = 5, nPlanes = 6, dim = 64, probeRadius = 1)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty && got == expected)
  }

  test("embedding clique collapse emits exactly the direct path's pairs") {
    import spark.implicits._
    // 8 copies of each of the first 40 sampled embeddings → distinct/raw
    // = 40/320 < 0.8 triggers the collapsed path; expected set from the
    // same driver-side bucket+verify reference over ALL member vectors
    val baseRows = Tables.embeddings(spark, sf).filter($"vec_id" < 200)
      .filter($"vec_id" % 5 === 0)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val members = for {
      (id, emb) <- baseRows.toSeq
      c <- 0 until 8
    } yield (id * 1000 + c, emb)
    val df = members.map { case (id, e) => (id, e.toSeq) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>"))
    val planes = Similarity.hyperplanes(6, 64)
    def bucket(v: Array[Float]): Long = {
      var b = 0L
      planes.indices.foreach { p =>
        var dot = 0.0
        v.indices.foreach(j => dot += v(j).toDouble * planes(p)(j))
        if (dot >= 0) b |= (1L << p)
      }
      b
    }
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (for {
      (ia, va) <- members; (ib, vb) <- members
      if ia < ib
      if java.lang.Long.bitCount(bucket(va) ^ bucket(vb)) <= 1
      if cos6(va, vb) >= 0.3
    } yield (ia, ib)).toSet
    val got = Similarity.cosineNearDupPairs(df,
        threshold = 0.3, sampleMod = 1, nPlanes = 6, dim = 64, probeRadius = 1)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // intra-clique pairs must be present (identical embeddings)
    assert(expected.exists { case (x, y) => x / 1000 == y / 1000 })
    assert(got == expected,
      s"collapsed != reference (missed ${(expected -- got).size}, extra ${(got -- expected).size})")
  }

  test("cosine expression matches a driver-side reference computation") {
    import spark.implicits._
    val rows = Tables.embeddings(spark, sf).filter($"vec_id" < 3)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val Array((_, v0), (_, v1), _) = rows
    def ref(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = Seq((v0.toSeq, v1.toSeq)).toDF("a", "b")
      .select(functions.VectorFns.cosine($"a", $"b")).collect().head.getDouble(0)
    assert(got == ref(v0, v1), "codegen cosine must be bit-equal to the sequential loop")
  }
}
