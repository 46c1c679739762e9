package graft

import graft.operators.{ImageCodec, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-decode image pipeline: javax.imageio round-trip exactness, the
  * perceptual-hash invariants the dedup queries rely on, and the
  * featurize fallback contract (real dims for decodable images, stub for
  * everything else). */
class ImageCodecSpec extends AnyFunSuite with SparkSpec {

  test("PNG encode -> decode round-trips gray samples exactly (lossless)") {
    val (w, h, gray) = ImageCodec.synthGray(7L)
    val png = ImageCodec.encodeGrayPng(w, h, gray)
    assert(ImageCodec.looksLikeImage(png))
    val Some((dw, dh, back)) = ImageCodec.decodeGray(png)
    assert(dw == w && dh == h)
    assert(back.sameElements(gray))
  }

  test("RGB images decode through integer BT.601 luma") {
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, (x * 40 << 16) | (y * 100 << 8) | 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, gray)) = ImageCodec.decodeGray(bos.toByteArray)
    assert(w == 4 && h == 2)
    for (y <- 0 until 2; x <- 0 until 4)
      assert(gray(y * 4 + x) == (299 * (x * 40) + 587 * (y * 100) + 114 * 200) / 1000)
  }

  test("non-image bytes are rejected cheaply, not decoded") {
    assert(ImageCodec.decodeGray("not an image".getBytes("UTF-8")).isEmpty)
    assert(!ImageCodec.looksLikeImage(Array[Byte](1, 2, 3)))
  }

  test("aHash and dHash are invariant to a uniform brightness shift") {
    val (w, h, gray) = ImageCodec.synthGray(12L)
    val brighter = gray.map(_ + 5)
    assert(ImageCodec.ahash64(w, h, gray) == ImageCodec.ahash64(w, h, brighter))
    assert(ImageCodec.dhash64(w, h, gray) == ImageCodec.dhash64(w, h, brighter))
  }

  test("planted near-dups (id % 20 == 1) hash identically to their canonical doc") {
    for (base <- Seq(20L, 40L, 120L)) {
      val (w1, h1, g1) = ImageCodec.synthGray(base)
      val (w2, h2, g2) = ImageCodec.synthGray(base + 1)
      assert(w1 == w2 && h1 == h2)
      assert(g2.zip(g1).forall { case (p2, p1) => p2 == p1 + 1 }) // one brightness step
      assert(ImageCodec.ahash64(w1, h1, g1) == ImageCodec.ahash64(w2, h2, g2))
      assert(ImageCodec.dhash64(w1, h1, g1) == ImageCodec.dhash64(w2, h2, g2))
    }
  }

  test("unrelated images land far apart; localized edits stay near") {
    val (w, h, g1) = ImageCodec.synthGray(6L)
    val (w2, h2, g2) = ImageCodec.synthGray(9L) // different gradient params, same dims
    assert(w2 == w && h2 == h)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(ImageCodec.ahash64(w, h, g1), ImageCodec.ahash64(w, h, g2)) > 8)
    // wipe one pooled cell's worth of pixels -> at most a few bits move
    val edited = g1.clone()
    for (y <- 0 until h / 8; x <- 0 until 9) edited(y * w + x) = 255
    assert(ham(ImageCodec.ahash64(w, h, g1), ImageCodec.ahash64(w, h, edited)) <= 4)
  }

  test("pooling handles dimensions that don't divide the grid") {
    val w = 70; val h = 50 // 70 % 8 != 0, 50 % 8 != 0 -> fixed-point path
    val gray = Array.tabulate(w * h)(i => (i * 31) % 256)
    val a1 = ImageCodec.ahash64(w, h, gray)
    val d1 = ImageCodec.dhash64(w, h, gray)
    assert(a1 == ImageCodec.ahash64(w, h, gray.clone())) // deterministic
    assert(d1 == ImageCodec.dhash64(w, h, gray.clone()))
    assert(a1 == ImageCodec.ahash64(w, h, gray.map(_ + 3))) // still shift-invariant
  }

  test("featurize reports REAL decoded dimensions for image payloads, stub otherwise") {
    import spark.implicits._
    val (w, h, gray) = ImageCodec.synthGray(3L)
    val png = ImageCodec.encodeGrayPng(w, h, gray)
    val textBytes = "just some text".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png),       // real decode
      Multimodal.MediaRow(2L, "image", textBytes), // fmt says image, bytes aren't -> stub
      Multimodal.MediaRow(3L, "video", png)        // video never decodes here -> stub
    ).toDS().toDF()
    val got = Multimodal.featurize(media).collect().map(m => m.doc_id -> m).toMap
    assert(got(1L).width == w && got(1L).height == h && got(1L).n_frames == 1L)
    val (sw, sh, _) = Multimodal.decodeStub(textBytes, "image")
    assert(got(2L).width == sw && got(2L).height == sh)
    val (vw, vh, vf) = Multimodal.decodeStub(png, "video")
    assert(got(3L).width == vw && got(3L).height == vh && got(3L).n_frames == vf)
  }

  test("phash over a synthetic corpus finds exactly the planted dup pairs via banding") {
    import spark.implicits._
    val ids = (0L until 200L).toDF("doc_id")
    val sigs = ImageCodec.phash(ImageCodec.synthImageTable(ids)).toDF()
      .select($"doc_id", $"ahash".as("sig"))
    val pairs = operators.Dedup.simhashPairsFromSigs(sigs, maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val planted = (0L until 200L).filter(_ % 20 == 1).map(i => (i - 1, i)).toSet
    assert(planted.subsetOf(pairs), s"missing planted pairs: ${planted -- pairs}")
  }
}
