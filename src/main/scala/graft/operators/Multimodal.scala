package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column plumbing.
  *
  * Images/audio/video ride as opaque `binary` payload columns with typed
  * metadata alongside. IMAGE payloads decode for REAL — javax.imageio
  * (pure JDK) via [[ImageCodec.decodeGray]], exercised end-to-end by the
  * image perceptual-hash queries. AUDIO payloads decode for REAL too —
  * javax.sound.sampled (pure JDK) via [[AudioCodec.decodePcm]], exercised
  * by the audio fingerprint/dedup queries. VIDEO container metadata is
  * REAL ([[VideoMeta.parseMp4Meta]], ISO-BMFF box walk) and frame DECODE
  * is real for image-coded samples (the Motion-JPEG layout —
  * [[VideoMeta.framePhashes]] slices samples out of the mdat and decodes
  * them through the same javax.imageio path as stills). Only payloads in
  * formats with NO pure-JDK codec at all (inter-frame-predicted video,
  * and any bytes that fail their modality's decoder) fall back to
  * [[Multimodal.decodeStub]], clearly marked, which derives dimensions
  * deterministically from the payload bytes so tests and oracles can pin
  * the plumbing end-to-end regardless of content.
  *
  * Scale notes: payloads never pass through a shuffle here — featurize is a
  * narrow mapPartitions. Further decoders (FFmpeg-equivalent for video)
  * slot into the same per-partition loop, amortizing codec init across the
  * partition's rows — the same batch shape `mapInPandas` gives a Python
  * decoder.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, fmt: String, n_bytes: Long,
                             width: Long, height: Long, n_frames: Long)

  /** ==== STUB (undecodable bytes only) ====
    * Deterministic fake decode for payloads NO pure-JDK codec can read
    * (inter-frame-predicted video codecs, compressed audio, arbitrary
    * bytes): real deployments replace this with a native codec. Output
    * depends only on (payload length, fmt) so the pipeline stays
    * reproducible and oracle-checkable. Payloads that actually decode —
    * images, WAV audio, ISO-BMFF containers, image-coded video samples
    * ([[VideoMeta.framePhashes]]) — never reach this; see [[featurize]]. */
  def decodeStub(payload: Array[Byte], fmt: String): (Long, Long, Long) = {
    val n = payload.length.toLong
    val width = 64L + (n * 7919L) % 1024L
    val height = 64L + (n * 104729L) % 768L
    val frames = fmt match {
      case "video" => 1L + (n % 32L)
      case "audio" => 1L + (n % 16L)
      case _       => 1L
    }
    (width, height, frames)
  }

  /** Attach a binary payload column to a text table (the ingest shape a
    * real pipeline gets from reading media files; here text bytes stand in
    * for the blob). fmt cycles deterministically by id. */
  def asMedia(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(
      id.as("doc_id"),
      element_at(typedlit(Seq("image", "audio", "video")), (id % 3 + 1).cast("int")).as("fmt"),
      encode(text, "UTF-8").as("payload"))

  /** Per-partition featurize: decode each payload, emit typed metadata.
    * Narrow (no shuffle); codec init happens once per partition. Image
    * payloads that parse (PNG/JPEG/GIF/BMP) yield their REAL decoded
    * dimensions via javax.imageio; audio payloads that parse (WAV/PCM)
    * yield REAL decoded properties via javax.sound.sampled, mapped onto
    * the media schema as width=sampleRate, height=16 (bits/sample),
    * n_frames=sample count; video and undecodable bytes fall back to the
    * deterministic stub. */
  def featurize(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory decode, no temp files
      it.map { r =>
        val real: Option[(Long, Long, Long)] = r.fmt match {
          case "image" =>
            ImageCodec.decodeGray(r.payload).map { case (w, h, _) =>
              (w.toLong, h.toLong, 1L)
            }
          case "audio" =>
            AudioCodec.decodePcm(r.payload).map { case (sr, samples) =>
              (sr.toLong, 16L, samples.length.toLong)
            }
          case "video" =>
            // container-level metadata is REAL (ISO-BMFF box walk);
            // only frame DECODE remains behind the stub
            VideoMeta.parseMp4Meta(r.payload).map { case (w, h, nf, _, _) =>
              (w.toLong, h.toLong, nf)
            }
          case _ => None
        }
        real match {
          case Some((w, h, f)) =>
            MediaMeta(r.doc_id, r.fmt, r.payload.length.toLong, w, h, f)
          case None =>
            val (w, h, f) = decodeStub(r.payload, r.fmt)
            MediaMeta(r.doc_id, r.fmt, r.payload.length.toLong, w, h, f)
        }
      }
    }
  }

  /** Resize metadata: fit (width, height) inside a `maxSide` box
    * preserving aspect ratio, never upscaling — the standard
    * training-data image normalization. Pure integer/long Column math
    * over the metadata (the pixel resample itself belongs in the same
    * per-partition codec slot as decode): target = floor(side · s) with
    * s = maxSide / max(w, h) capped at 1. Row-local, no shuffle. */
  def resizeMeta(width: Column, height: Column, maxSide: Int): (Column, Column) = {
    val longest = greatest(width, height)
    def fit(side: Column): Column =
      when(longest <= maxSide, side)
        .otherwise(floor(side * maxSide / longest))
    (fit(width), fit(height))
  }

  /** Frame sampling plan for video/audio payloads: pick ~`perDoc` evenly
    * spaced frame indices (always including frame 0, stride
    * ceil(n/perDoc)), emitted one row per sampled frame — the fan-out a
    * decoder consumes to extract stills. Row-local explode of a bounded
    * sequence; payloads themselves are not duplicated (frame rows carry
    * doc_id + frame_idx only, the decode pass re-joins by id). */
  def sampleFrames(meta: DataFrame, perDoc: Int): DataFrame = {
    val stride = ceil(col("n_frames").cast("double") / perDoc).cast("long")
    meta.filter(col("n_frames") > 1)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, stride)))
  }
}
