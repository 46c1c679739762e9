package graft

import graft.functions.{PrivacyFns, VectorFns}
import graft.operators.{Bm25, Decontaminate, SeqPack, TopicCluster}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 curation operators: PII masking, decontamination, BM25,
  * sequence packing, topic clustering, int8 quantization. */
class CurationOpsSpec extends AnyFunSuite with SparkSpec {

  // ---- PrivacyFns ----------------------------------------------------

  test("PII masks: email, phone, ipv4, digit runs") {
    import spark.implicits._
    val df = Seq(
      "write to bob.smith+x@corp.example.org today",
      "call (415) 555-2671 or +1 415.555.2671",
      "host 192.168.0.12 responded",
      "account 123456789 and card 4111111111111111",
      "clean text stays clean").toDF("t")
    val out = df.select(
      PrivacyFns.maskEmail($"t").as("e"), PrivacyFns.maskPhone($"t").as("p"),
      PrivacyFns.maskIpv4($"t").as("ip"),
      PrivacyFns.maskDigitRuns($"t").as("d"),
      PrivacyFns.digitRunCount($"t").as("n")).collect()
    assert(out(0).getString(0) == "write to [EMAIL] today")
    assert(out(1).getString(1) == "call [PHONE] or [PHONE]")
    assert(out(2).getString(2) == "host [IP] responded")
    assert(out(3).getString(3) == "account [ID] and card [ID]")
    assert(out(3).getLong(4) == 2L)
    assert(out(4).toSeq.take(4).forall(_ == "clean text stays clean"))
  }

  test("pseudonym is stable and 12 hex chars") {
    import spark.implicits._
    val p = Seq("Customer#42", "Customer#42", "Customer#43").toDF("id")
      .select(PrivacyFns.pseudonym($"id").as("p")).collect().map(_.getString(0))
    assert(p(0) == p(1) && p(0) != p(2))
    assert(p(0).matches("[0-9a-f]{12}"))
  }

  // ---- Decontaminate -------------------------------------------------

  test("decontamination flags exactly the docs sharing an n-gram") {
    import spark.implicits._
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "prefix words alpha beta gamma delta epsilon more"), // shares 5-grams
      (11L, "completely different content with no overlap at all"),
      (12L, "alpha beta gamma delta epsilon")                     // exact 5-gram
    ).toDF("doc_id", "text")
    val hits = Decontaminate.contaminated(train, bench, $"text", $"doc_id", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(10L, 12L))
    // bench doc has 5-grams {alpha..epsilon, beta..zeta}; both trains
    // contain only the first
    assert(hits(10L) == 1L)
    assert(hits(12L) == 1L)
  }

  test("decontamination broadcasts the benchmark side") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val plan = Decontaminate.contaminated(
      docs.filter($"doc_id" % 97 =!= 0), docs.filter($"doc_id" % 97 === 0),
      $"text", $"doc_id", n = 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("embedding decontamination flags exactly the vectors past the cosine bar") {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val bench = Seq((100L, v(1, 0, 0, 0))).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, v(1, 0, 0, 0)),        // identical: cosine 1.0
      (2L, v(0.9, 0.1, 0, 0)),    // near: cosine ~0.994
      (3L, v(0, 1, 0, 0)),        // orthogonal: cosine 0
      (4L, v(-1, 0, 0, 0))        // opposite: cosine -1
    ).toDF("vec_id", "embedding")
    val hits = Decontaminate.contaminatedByEmbedding(train, bench, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(hits.keySet == Set(1L, 2L))
    assert(hits(1L) == (1L, 1.0))
    assert(hits(2L)._1 == 1L && hits(2L)._2 > 0.99)
    // the corpus side must stay a broadcast scan — never shuffle
    val plan = Decontaminate.contaminatedByEmbedding(
      Tables.embeddings(spark, sf).filter($"vec_id" % 97 =!= 0),
      Tables.embeddings(spark, sf).filter($"vec_id" % 97 === 0), 0.3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"benchmark side not broadcast:\n$plan")
  }

  // ---- BM25 ----------------------------------------------------------

  test("bm25 favors rare terms and saturates tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare common common common"),
      (2L, "common common common common"),
      (3L, "common common other other")).toDF("id", "text")
    val out = Bm25.topTerms(docs, $"text", $"id", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    // 'rare' (df=1) must outrank 'common' (df=3) in doc 1
    assert(out.contains((1L, "rare", 1L)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._3).map(_._2)
    assert(doc1.head == "rare")
  }

  test("bm25 length normalization: same tf scores higher in shorter doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "term filler"),
      (2L, "term filler filler filler filler filler filler filler")).toDF("id", "text")
    val sc = Bm25.topTerms(docs, $"text", $"id", k = 5)
      .filter($"term" === "term")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(sc(1L) > sc(2L))
  }

  // ---- SeqPack -------------------------------------------------------

  test("sequence packing conserves tokens and fills all but the last window") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"doc_id",
        size(graft.functions.TextFns.tokens($"text")).as("n_toks"))
    val w = SeqPack.windows(docs, $"lang", $"doc_id", $"n_toks", windowTokens = 512)
      .collect()
    val totalIn = docs.agg(sum($"n_toks")).collect().head.getLong(0)
    assert(w.map(_.getAs[Long]("n_tokens")).sum == totalIn)
    // every window except each shard's last holds exactly 512 tokens
    val byShard = w.groupBy(_.getAs[String]("shard"))
    byShard.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("window_id"))
      sorted.init.foreach(r => assert(r.getAs[Long]("n_tokens") == 512L))
      assert(sorted.last.getAs[Long]("n_tokens") <= 512L)
      // window ids are contiguous from 0
      assert(sorted.map(_.getAs[Long]("window_id")).toSeq ==
        (0L until sorted.length.toLong))
    }
    // doc ranges of consecutive windows overlap by at most the boundary doc
    byShard.foreach { case (_, rows) =>
      rows.sortBy(_.getAs[Long]("window_id")).sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("first_doc") >= a.getAs[Long]("last_doc") - 1)
        case _ => ()
      }
    }
  }

  // ---- TopicCluster --------------------------------------------------

  test("topic clustering is deterministic and Lloyd improves the objective") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val model = operators.IvfAnn.train(e, "vec_id", "embedding", k = 8)
    val a1 = TopicCluster.assign(e, "vec_id", "embedding", model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = TopicCluster.assign(e, "vec_id", "embedding", model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2)
    // every vector gets exactly one cluster, all clusters in range
    assert(a1.size == e.count())
    assert(a1.values.forall(c => c >= 0 && c < 8))
    // spherical k-means objective (mean max-dot of unit vectors against
    // their centroid) must improve over the untrained init centroids
    val vecs = e.select($"embedding").collect().map { r =>
      val v = r.getSeq[Float](0).map(_.toDouble).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    def objective(m: operators.IvfAnn.Model): Double = vecs.map { v =>
      m.centroids.map(c => c.zip(v).map { case (a, b) => a * b }.sum).max
    }.sum / vecs.length
    val init = operators.IvfAnn.train(e, "vec_id", "embedding", k = 8, iters = 0)
    assert(objective(model) > objective(init),
      s"trained=${objective(model)} init=${objective(init)}")
  }

  // ---- Multimodal resize / frame sampling ---------------------------

  test("resize fits the longest side to the box, preserves aspect, never upscales") {
    import spark.implicits._
    val df = Seq((1L, 1024L, 512L), (2L, 100L, 50L), (3L, 200L, 800L))
      .toDF("id", "width", "height")
    val (rw, rh) = operators.Multimodal.resizeMeta($"width", $"height", 256)
    val got = df.select($"id", rw.as("w"), rh.as("h")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (256L, 128L))   // downscale, aspect kept
    assert(got(2L) == (100L, 50L))    // small image untouched
    assert(got(3L) == (64L, 256L))    // portrait fit
  }

  test("frame sampling: ~perDoc evenly spaced indices incl. frame 0, in range") {
    import spark.implicits._
    val meta = Seq((1L, "video", 32L), (2L, "audio", 2L), (3L, "image", 1L))
      .toDF("doc_id", "fmt", "n_frames")
    val rows = operators.Multimodal.sampleFrames(meta, perDoc = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val byDoc = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byDoc(1L) == Seq(0L, 8L, 16L, 24L)) // stride ceil(32/4)=8
    assert(byDoc(2L) == Seq(0L, 1L))           // tiny clip: all frames
    assert(!byDoc.contains(3L))                // single-frame payloads skipped
  }

  // ---- VectorFns quantization ---------------------------------------

  test("int8 quantization bounds, sign, and zero-vector handling") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val out = df
      .select($"id", $"v", VectorFns.maxAbs($"v").as("s"))
      .select($"id", VectorFns.quantizeInt8($"v", $"s").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(64L, -127L, 32L))
    assert(out(2L) == Seq(0L, 0L, 0L))
  }
}
