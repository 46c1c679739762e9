package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/** Container-level VIDEO metadata over binary payload columns.
  *
  * The honest boundary stands: FRAME decode needs codec libraries the
  * JDK doesn't ship, so pixel-level work stays behind the documented
  * stub. But everything a pipeline needs BEFORE deciding to decode —
  * dimensions, frame count, duration, timescale — lives in the
  * container's box structure, and ISO-BMFF (MP4, a public ISO/IEC
  * 14496-12 format) parses with a plain length-prefixed box walk, no
  * codec at all. This is the video analogue of reading a PNG's IHDR
  * without inflating the image data:
  *
  *  - [[parseMp4Meta]] walks `[size:u32][type:4cc][payload]` boxes,
  *    descending into moov/trak/mdia/minf/stbl, and extracts tkhd's
  *    16.16-fixed width/height, mdhd's timescale+duration, and stsz's
  *    sample (=frame) count. A pure function over the byte array —
  *    no locks (the AudioSystem lesson), no allocation beyond the walk.
  *  - [[encodeMp4Meta]] writes the minimal well-formed skeleton (ftyp +
  *    moov with one video trak; no mdat since there are no coded
  *    frames), so the corpus round-trips through REAL container bytes
  *    and any standard MP4 tool agrees on the fields.
  *
  * Scale shape: metadata extraction is a narrow map over the payload
  * column — at 100 TB only the first few hundred bytes of each payload
  * matter (moov leads here; a production reader range-requests it), and
  * only the tiny typed meta rows travel.
  */
object VideoMeta {

  final case class VideoRow(doc_id: Long, payload: Array[Byte])
  final case class VideoMetaRow(doc_id: Long, width: Long, height: Long,
                                n_frames: Long, timescale: Long,
                                duration_ms: Long)

  /** Magic sniff: box 0 is `ftyp` (size ≥ 16, type at bytes 4–8). */
  def looksLikeMp4(p: Array[Byte]): Boolean =
    p.length >= 16 &&
      p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  private def be32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xFFL) << 24) | ((p(o + 1) & 0xFFL) << 16) |
      ((p(o + 2) & 0xFFL) << 8) | (p(o + 3) & 0xFFL)

  /** Parse (width, height, n_frames, timescale, durationTicks) from the
    * box tree. None when the bytes aren't a well-formed MP4 skeleton or
    * any required field is missing — malformed containers are declined,
    * never mis-read. */
  def parseMp4Meta(p: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
    if (!looksLikeMp4(p)) return None
    var width = -1
    var height = -1
    var nFrames = -1L
    var timescale = -1L
    var duration = -1L
    // which box types are pure containers we descend into
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    def walk(from: Int, to: Int): Boolean = { // false = structurally broken
      var off = from
      while (off + 8 <= to) {
        val size = be32(p, off)
        if (size < 8 || off + size > to) return false // truncated/corrupt
        val typ = new String(p, off + 4, 4, "US-ASCII")
        val body = off + 8
        typ match {
          case t if containers(t) =>
            if (!walk(body, off + size.toInt)) return false
          case "tkhd" =>
            // v0 layout: ver/flags(4) ctime(4) mtime(4) track(4) rsvd(4)
            // duration(4) rsvd(8) layer(2) group(2) volume(2) rsvd(2)
            // matrix(36) width(4) height(4) — width at body+76, 16.16
            if (size >= 8 + 84 && p(body) == 0) {
              width = (be32(p, body + 76) >> 16).toInt
              height = (be32(p, body + 80) >> 16).toInt
            }
          case "mdhd" =>
            // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
            if (size >= 8 + 20 && p(body) == 0) {
              timescale = be32(p, body + 12)
              duration = be32(p, body + 16)
            }
          case "stsz" =>
            // ver/flags(4) sample_size(4) sample_count(4)
            if (size >= 8 + 12) nFrames = be32(p, body + 8)
          case _ => () // ftyp, free, mdat, codec-specific boxes: skip
        }
        off += size.toInt
      }
      true
    }
    if (!walk(0, p.length)) return None
    if (width <= 0 || height <= 0 || nFrames < 0 || timescale <= 0 ||
        duration < 0) None
    else Some((width, height, nFrames, timescale, duration))
  }

  /** Write the minimal well-formed metadata skeleton: ftyp + moov
    * containing one video trak (tkhd with 16.16 dimensions, mdhd with
    * timescale/duration, stbl/stsz with the frame count). The exact
    * inverse of [[parseMp4Meta]]; no mdat — there are no coded frames,
    * which is the point of the boundary. */
  def encodeMp4Meta(width: Int, height: Int, nFrames: Long,
                    timescale: Long, durationTicks: Long): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(8)
      b.put("isom".getBytes("US-ASCII")).putInt(0)
      b.array()
    })
    val tkhd = box("tkhd", {
      val b = ByteBuffer.allocate(84).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)                  // version 0 + flags
      b.putInt(0).putInt(0)        // ctime, mtime
      b.putInt(1)                  // track id
      b.putInt(0)                  // reserved
      b.putInt(durationTicks.toInt)
      b.putLong(0L)                // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer/group/volume/rsvd
      // identity matrix (16.16 / 2.30 fixed point)
      b.putInt(0x10000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x10000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.putInt(width << 16).putInt(height << 16)
      b.array()
    })
    val mdhd = box("mdhd", {
      val b = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)                  // version 0 + flags
      b.putInt(0).putInt(0)        // ctime, mtime
      b.putInt(timescale.toInt).putInt(durationTicks.toInt)
      b.putShort(0x55C4.toShort)   // language "und"
      b.putShort(0)                // predefined
      b.array()
    })
    val stsz = box("stsz", {
      val b = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0)                  // version + flags
      b.putInt(0)                  // sample_size 0 = per-sample table
      b.putInt(nFrames.toInt)
      b.array()
    })
    val stbl = box("stbl", stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", trak)
    ftyp ++ moov
  }

  /** Extract container metadata for each payload — narrow map, payloads
    * never shuffle; undecodable payloads are dropped. duration_ms uses
    * exact integer math (ticks·1000/timescale). */
  def containerMeta(videos: DataFrame): Dataset[VideoMetaRow] = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.as[VideoRow].mapPartitions { it =>
      it.flatMap { r =>
        parseMp4Meta(r.payload).map { case (w, h, nf, ts, dur) =>
          VideoMetaRow(r.doc_id, w.toLong, h.toLong, nf, ts,
            dur * 1000L / ts)
        }
      }
    }
  }

  // ---- deterministic synthetic containers ------------------------------

  /** Synthetic container parameters for doc `id` — dimensions, frame
    * count, timescale, duration formulae are pure integer and replayed
    * verbatim by the SQL oracle. */
  def synthParams(id: Long): (Int, Int, Long, Long, Long) = {
    val w = (320 + 16 * (id % 20)).toInt
    val h = (240 + 16 * (id % 15)).toInt
    val nf = 24 + (id % 97)
    val ts = 600L
    val dur = nf * 25 // 25 ticks/frame -> 24 fps at timescale 600
    (w, h, nf, ts, dur)
  }

  /** One real MP4 skeleton per id (narrow map; ids fan out to cores
    * like the image/audio corpora — container writing is cheap but the
    * shape stays uniform across the three modalities). */
  def synthVideoTable(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, nf, ts, dur) = synthParams(id)
          VideoRow(id, encodeMp4Meta(w, h, nf, ts, dur))
        }
      }.toDF()
  }
}
