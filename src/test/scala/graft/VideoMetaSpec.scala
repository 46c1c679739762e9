package graft

import graft.operators.{Multimodal, VideoMeta}
import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF container metadata: the box walk must round-trip the writer
  * exactly and DECLINE malformed containers rather than mis-read them. */
class VideoMetaSpec extends AnyFunSuite with SparkSpec {

  test("property: ARBITRARY metadata tuples round-trip through the container") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(Gen.chooseNum(1, 7680), Gen.chooseNum(1, 4320),
        Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1L, 90000L),
        Gen.chooseNum(0L, 100000000L)) { (w, h, nf, ts, dur) =>
        VideoMeta.parseMp4Meta(VideoMeta.encodeMp4Meta(w, h, nf, ts, dur))
          .contains((w, h, nf, ts, dur))
      })
    assert(res.passed, res.status.toString)
  }

  test("MP4 skeleton round-trips every metadata field exactly") {
    (0L until 200L).foreach { id =>
      val (w, h, nf, ts, dur) = VideoMeta.synthParams(id)
      val mp4 = VideoMeta.encodeMp4Meta(w, h, nf, ts, dur)
      assert(VideoMeta.looksLikeMp4(mp4))
      assert(VideoMeta.parseMp4Meta(mp4).contains((w, h, nf, ts, dur)),
        s"round-trip failed for doc $id")
    }
  }

  test("malformed containers are declined, never mis-read") {
    assert(VideoMeta.parseMp4Meta("not a video".getBytes("UTF-8")).isEmpty)
    assert(VideoMeta.parseMp4Meta(Array[Byte]()).isEmpty)
    val ok = VideoMeta.encodeMp4Meta(320, 240, 24, 600, 600)
    // truncated: the moov box's declared size overruns the payload
    assert(VideoMeta.parseMp4Meta(java.util.Arrays.copyOf(ok, ok.length - 8)).isEmpty)
    // corrupt box size (< 8) inside the tree
    val bad = ok.clone()
    bad(19) = 2 // ftyp payload is 8 bytes; byte 16..19 = moov size field
    assert(VideoMeta.parseMp4Meta(bad).isEmpty)
  }

  test("containerMeta extracts the synthesized fields end-to-end") {
    import spark.implicits._
    val vids = VideoMeta.synthVideoTable((0L until 50L).toDF("doc_id"))
    val rows = VideoMeta.containerMeta(vids).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val (w, h, nf, ts, dur) = VideoMeta.synthParams(r.doc_id)
      assert(r.width == w && r.height == h && r.n_frames == nf)
      assert(r.timescale == ts && r.duration_ms == dur * 1000L / ts)
    }
  }

  test("featurize reports REAL container metadata for MP4 payloads") {
    import spark.implicits._
    val mp4 = VideoMeta.encodeMp4Meta(640, 480, 48, 600, 1200)
    val media = Seq((9L, "video", mp4)).toDF("doc_id", "fmt", "payload")
    val m = Multimodal.featurize(media).collect().head
    assert(m.width == 640L && m.height == 480L && m.n_frames == 48L)
  }

  /** Test-only box builder for hand-made multi-track containers. */
  private def mkBox(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
    b.array()
  }

  private def mkTrak(w: Int, h: Int, ts: Long, dur: Long, nf: Long): Array[Byte] = {
    val tkhd = mkBox("tkhd", {
      val b = java.nio.ByteBuffer.allocate(84).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(0).putInt(0).putInt(0).putInt(1).putInt(0).putInt(dur.toInt)
      b.putLong(0L).putShort(0).putShort(0).putShort(0).putShort(0)
      b.putInt(0x10000).putInt(0).putInt(0).putInt(0).putInt(0x10000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.putInt(w << 16).putInt(h << 16) // audio traks carry 0×0 here
      b.array()
    })
    val mdhd = mkBox("mdhd", {
      val b = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(0).putInt(0).putInt(0).putInt(ts.toInt).putInt(dur.toInt)
      b.putShort(0x55C4.toShort).putShort(0)
      b.array()
    })
    val stsz = mkBox("stsz", {
      val b = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(0).putInt(0).putInt(nf.toInt)
      b.array()
    })
    mkBox("trak", tkhd ++ mkBox("mdia", mdhd ++ mkBox("minf", mkBox("stbl", stsz))))
  }

  test("multi-track containers parse the VIDEO trak, never a cross-trak mixture") {
    val ftyp = mkBox("ftyp", {
      val b = java.nio.ByteBuffer.allocate(8)
      b.put("isom".getBytes("US-ASCII")).putInt(0); b.array()
    })
    val audio = mkTrak(0, 0, 44100L, 441000L, 431L) // zero-dim tkhd = sound trak
    val video = mkTrak(640, 480, 600L, 1200L, 48L)
    // the common layout: video trak first, audio second — and the reverse,
    // where the last-wins bug read the audio trak's fields
    val videoFirst = ftyp ++ mkBox("moov", video ++ audio)
    val audioFirst = ftyp ++ mkBox("moov", audio ++ video)
    val want = Some((640, 480, 48L, 600L, 1200L))
    assert(VideoMeta.parseMp4Meta(videoFirst) == want)
    assert(VideoMeta.parseMp4Meta(audioFirst) == want,
      "an audio trak BEFORE the video trak must not shadow or mix its fields")
    // a file with only sound traks has no video metadata to report
    assert(VideoMeta.parseMp4Meta(ftyp ++ mkBox("moov", audio)).isEmpty)
  }

  // ---- real frame storage + decode --------------------------------------

  test("sample-carrying container round-trips metadata, sizes and frame bytes") {
    val frames = Array(
      Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6, 7, 8, 9))
    val mp4 = VideoMeta.encodeMp4WithSamples(320, 240, 600L, 75L, frames)
    assert(VideoMeta.parseMp4Meta(mp4).contains((320, 240, 3L, 600L, 75L)),
      "the metadata walk must read the per-sample stsz's count unchanged")
    val Some((sizes, off)) = VideoMeta.parseSampleIndex(mp4)
    assert(sizes.toSeq == Seq(3, 1, 5))
    val prefix = sizes.scanLeft(0)(_ + _)
    frames.indices.foreach { i =>
      val got = java.util.Arrays.copyOfRange(mp4, off + prefix(i), off + prefix(i + 1))
      assert(got.toSeq == frames(i).toSeq, s"frame $i bytes differ")
    }
    // the stco chunk offset is the REAL absolute mdat body offset
    val stcoOff = {
      // locate stco by scanning for the fourcc (test-only convenience)
      val idx = mp4.indices.find(i => i + 4 <= mp4.length &&
        mp4(i) == 's' && mp4(i + 1) == 't' && mp4(i + 2) == 'c' && mp4(i + 3) == 'o').get
      ((mp4(idx + 12) & 0xFF) << 24) | ((mp4(idx + 13) & 0xFF) << 16) |
        ((mp4(idx + 14) & 0xFF) << 8) | (mp4(idx + 15) & 0xFF)
    }
    assert(stcoOff == off, "stco must point at the mdat body")
  }

  test("truncated mdat and missing sample table are declined") {
    val frames = Array(Array[Byte](1, 2, 3, 4), Array[Byte](5, 6, 7, 8))
    val mp4 = VideoMeta.encodeMp4WithSamples(64, 64, 600L, 50L, frames)
    // chop half the mdat: declared sample sizes overrun the remaining body
    assert(VideoMeta.parseSampleIndex(
      java.util.Arrays.copyOf(mp4, mp4.length - 5)).isEmpty)
    // the metadata-only skeleton has no usable sample index
    val skeleton = VideoMeta.encodeMp4Meta(64, 64, 4, 600, 100)
    assert(VideoMeta.parseSampleIndex(skeleton).isEmpty)
  }

  test("framePhashes decodes REAL PNG samples to the planted pixel hashes") {
    import spark.implicits._
    import graft.operators.ImageCodec
    val vids = VideoMeta.synthVideoWithFrames((0L until 40L).toDF("doc_id"))
    val rows = VideoMeta.framePhashes(vids, perDoc = 4).collect()
    val byDoc = rows.groupBy(_.doc_id)
    (0L until 40L).foreach { id =>
      val (_, _, _, w, h, nf) = VideoMeta.synthFrameParams(id)
      val stride = (nf + 3) / 4
      val wantIdx = Range(0, nf, stride)
      val got = byDoc(id).sortBy(_.frame_idx)
      assert(got.map(_.frame_idx).toSeq == wantIdx.map(_.toLong),
        s"doc $id sampled frames")
      got.foreach { fr =>
        val (fw, fh, gray) = VideoMeta.synthFrameGray(id, fr.frame_idx.toInt)
        assert(fr.width == w && fr.height == h)
        assert(fr.ahash == ImageCodec.ahash64(fw, fh, gray),
          s"doc $id frame ${fr.frame_idx} ahash: decoded pixels must equal the formula")
        assert(fr.dhash == ImageCodec.dhash64(fw, fh, gray))
      }
    }
  }

  test("uniform-size stsz (sample_size > 0) yields the sample index too") {
    // hand-build: take a per-sample container of equal-size frames and
    // rewrite its stsz to the uniform encoding
    val frames = Array.fill(3)(Array[Byte](9, 8, 7, 6))
    val mp4 = VideoMeta.encodeMp4WithSamples(64, 64, 600L, 75L, frames)
    val idx = mp4.indices.find(i => i + 4 <= mp4.length &&
      mp4(i) == 's' && mp4(i + 1) == 't' && mp4(i + 2) == 's' && mp4(i + 3) == 'z').get
    // stsz body starts at idx+4: ver/flags, sample_size, count, table...
    val uni = mp4.clone()
    uni(idx + 4 + 4 + 3) = 4 // sample_size = 4 (other three bytes already 0)
    val Some((sizes, _)) = VideoMeta.parseSampleIndex(uni)
    assert(sizes.toSeq == Seq(4, 4, 4))
  }

  test("video dedup surfaces every planted brightness-shifted copy with its source") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val expected = Tables.documents(spark, sf).select($"doc_id")
      .filter($"doc_id" % 7 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    val pairs = SparkEntry.queries("q_video_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(pairs),
      s"missing planted pairs: ${(expected -- pairs).take(5)}")
    // the shift must be byte-visible (a real near-dup, not a byte copy)
    val corpus = Tables.documents(spark, sf).select($"doc_id").limit(1)
      .select($"doc_id", $"doc_id".as("seed"))
    val orig = operators.VideoMeta.synthVideoWithFramesSeeded(corpus)
      .collect().head.getAs[Array[Byte]]("payload")
    val shifted = operators.VideoMeta.synthVideoWithFramesSeeded(
        corpus.select(($"doc_id" + 1000000L).as("doc_id"), $"seed"))
      .collect().head.getAs[Array[Byte]]("payload")
    assert(!java.util.Arrays.equals(orig, shifted),
      "planted copy is a byte-identical duplicate, not a near-dup")
  }

  test("crafted stsz counts and sizes are declined before any allocation") {
    val frames = Array(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6))
    val mp4 = VideoMeta.encodeMp4WithSamples(64, 64, 600L, 50L, frames)
    val idx = mp4.indices.find(i => i + 4 <= mp4.length &&
      mp4(i) == 's' && mp4(i + 1) == 't' && mp4(i + 2) == 's' && mp4(i + 3) == 'z').get
    // stsz body at idx+4: sample_size at idx+8, sample_count at idx+12,
    // per-sample table at idx+16.
    // count = 2^30 with uniform size 1: would be a ~4 GiB Array.fill if
    // the count weren't validated against the payload — must decline
    val hugeCount = mp4.clone()
    hugeCount(idx + 8 + 3) = 1 // uniform sample_size = 1
    hugeCount(idx + 12) = 0x40.toByte
    hugeCount(idx + 13) = 0; hugeCount(idx + 14) = 0; hugeCount(idx + 15) = 0
    assert(VideoMeta.parseSampleIndex(hugeCount).isEmpty,
      "a sample count exceeding the container must yield no sample index")
    // a table entry with the top bit set reads as a NEGATIVE Int size: it
    // shrinks the mdat total (passing the overrun check) and then feeds
    // from > to bounds into the frame slicer — must be declined here
    val negSize = mp4.clone()
    negSize(idx + 16) = 0x80.toByte
    assert(VideoMeta.parseSampleIndex(negSize).isEmpty,
      "negative per-sample sizes must be declined")
  }
}
