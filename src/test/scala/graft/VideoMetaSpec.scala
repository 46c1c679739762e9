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
}
