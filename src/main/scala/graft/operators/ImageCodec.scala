package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image decode + perceptual hashing over binary payload columns.
  *
  * The decode is REAL: `javax.imageio` (pure JDK, no native deps) parses
  * PNG/JPEG/GIF/BMP payloads into pixel rasters inside a narrow
  * mapPartitions — the codec slot [[Multimodal.featurize]] reserves. On
  * top of the decoded bitmap sit the two classic perceptual hashes used
  * for image near-dup detection in training-data pipelines (public
  * algorithms from the pHash family):
  *
  *  - aHash (average hash): average-pool the image to an 8×8 grid, set
  *    bit k when cell k's mean exceeds the global mean. Invariant to
  *    uniform brightness shifts.
  *  - dHash (difference/gradient hash): pool to a 9×8 grid, set bit when
  *    a cell outshines its right neighbor — a horizontal-gradient sketch,
  *    also brightness-shift invariant.
  *
  * Both are 64-bit signatures, so the SimHash banding machinery
  * (Dedup.simhashPairsFromSigs — pigeonhole 4×16 bands, hot-bucket
  * sub-splits, never all-pairs) runs UNCHANGED over image hashes: the
  * image dedup plan at 100 TB is the text simhash plan with a different
  * signature source. All pooling is exact integer arithmetic (block SUM
  * comparisons over equal-area cells, no float resampling), so hashes
  * are bit-deterministic across engines and replayable as a SQL oracle.
  *
  * Scale shape: payloads are decoded where they sit (narrow map, no
  * payload shuffle); only 8-byte signatures travel to the pair join.
  */
object ImageCodec {

  final case class ImageRow(doc_id: Long, payload: Array[Byte])
  final case class PhashRow(doc_id: Long, width: Long, height: Long,
                            ahash: Long, dhash: Long)

  /** Magic-byte sniff: only hand plausible image payloads to ImageIO —
    * reader discovery on arbitrary bytes (e.g. the text payloads that
    * share the media schema) costs a registry scan per row. */
  def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) ||                       // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||                        // GIF
      (p(0) == 'B' && p(1) == 'M'))                                         // BMP

  /** Decode a payload to (width, height, row-major 8-bit gray samples).
    * Single-band rasters are read directly; multi-band images decode
    * through integer BT.601 luma ((299r + 587g + 114b) / 1000) so gray
    * values stay bit-deterministic. None when no reader accepts the
    * bytes. */
  def decodeGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (!looksLikeImage(payload)) return None
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](w * h)
    if (img.getRaster.getNumBands == 1) {
      img.getRaster.getSamples(0, 0, w, h, 0, out)
    } else {
      var y = 0
      var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF
          val g = (rgb >> 8) & 0xFF
          val b = rgb & 0xFF
          out(i) = (299 * r + 587 * g + 114 * b) / 1000
          x += 1; i += 1
        }
        y += 1
      }
    }
    Some((w, h, out))
  }

  /** Encode 8-bit gray samples as a (lossless) PNG — the exact inverse of
    * [[decodeGray]] for single-band images; pinned by ImageCodecSpec's
    * round-trip test. */
  def encodeGrayPng(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, gray)
    val bos = new ByteArrayOutputStream(math.max(64, w * h / 2))
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Pool `gray` onto a `gw`×`gh` grid of equal-area cells (floor
    * boundaries: cell i spans [i·w/gw, (i+1)·w/gw)), returning each
    * cell's pixel SUM scaled to a common denominator — cell areas can
    * differ by one row/column when the image doesn't divide evenly, so
    * sums are normalized by cross-multiplying with the cell area
    * (exact integer mean comparison, no float resampling). */
  private def poolSums(w: Int, h: Int, gray: Array[Int],
                       gw: Int, gh: Int): Array[Long] = {
    val sums = new Array[Long](gw * gh)
    val areas = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val cy = (y.toLong * gh / h).toInt
      var x = 0
      val rowOff = y * w
      while (x < w) {
        val cx = (x.toLong * gw / w).toInt
        val k = cy * gw + cx
        sums(k) += gray(rowOff + x)
        areas(k) += 1
        x += 1
      }
      y += 1
    }
    // scale every cell sum to the common denominator Π areas is overkill;
    // multiply each by (totalArea / ownArea) exactly when areas divide the
    // image evenly (our grids), else fall back to mean·2^20 fixed point.
    val even = areas.forall(_ == areas(0))
    if (even) sums
    else {
      val out = new Array[Long](sums.length)
      var i = 0
      while (i < sums.length) {
        out(i) = (sums(i) << 20) / areas(i) // fixed-point mean
        i += 1
      }
      out
    }
  }

  /** 64-bit average hash: bit k set when cell k's mean exceeds the global
    * mean — as integer math, cellSum·64 > totalSum over an 8×8 grid. */
  def ahash64(w: Int, h: Int, gray: Array[Int]): Long = {
    val cells = poolSums(w, h, gray, 8, 8)
    var total = 0L
    var i = 0
    while (i < 64) { total += cells(i); i += 1 }
    var sig = 0L
    i = 0
    while (i < 64) {
      if (cells(i) * 64L > total) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** 64-bit difference hash: 9×8 grid, bit (row·8 + col) set when
    * cell(col, row) > cell(col+1, row). */
  def dhash64(w: Int, h: Int, gray: Array[Int]): Long = {
    val cells = poolSums(w, h, gray, 9, 8)
    var sig = 0L
    var row = 0
    while (row < 8) {
      var c = 0
      while (c < 8) {
        if (cells(row * 9 + c) > cells(row * 9 + c + 1))
          sig |= (1L << (row * 8 + c))
        c += 1
      }
      row += 1
    }
    sig
  }

  /** Decode each payload and emit perceptual hashes + real dimensions —
    * one narrow mapPartitions, ImageIO's disk cache off (pure in-memory
    * decode). Undecodable payloads are dropped. */
  def phash(images: DataFrame): Dataset[PhashRow] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.as[ImageRow].mapPartitions { it =>
      ImageIO.setUseCache(false) // no temp-file spooling per image
      it.flatMap { r =>
        decodeGray(r.payload).map { case (w, h, gray) =>
          PhashRow(r.doc_id, w.toLong, h.toLong,
            ahash64(w, h, gray), dhash64(w, h, gray))
        }
      }
    }
  }

  /** Split a signed 64-bit signature into its printable halves-hex form
    * (`%08x%08x` of the unsigned high/low words) — sign-safe in every
    * engine, unlike a signed BIGINT literal. */
  def hexSig(sig: Column): Column = concat(
    lpad(lower(hex(shiftrightunsigned(sig, 32))), 8, "0"),
    lpad(lower(hex(sig.bitwiseAND(lit(0xFFFFFFFFL)))), 8, "0"))

  // ---- deterministic synthetic images ---------------------------------

  /** Synthetic-corpus parameters for doc `id`: docs with id % 20 == 1 are
    * PLANTED near-duplicates of id-1 — the same gradient pattern one
    * brightness step up, which aHash/dHash map to the identical signature
    * (both hashes are brightness-shift invariant). Pixel values are
    * `(a·x + b·y) mod 240 + c` with c ≤ 14, so a +1 brightness step never
    * wraps — the shift is uniform across every pixel. */
  def synthParams(id: Long): (Int, Int, Int, Int, Int) = {
    val dup = id % 20 == 1
    val cid = if (dup) id - 1 else id
    val a = (cid % 89 + 1).toInt
    val b = (cid % 97 + 1).toInt
    val c = (cid % 13).toInt + (if (dup) 1 else 0)
    val w = 72
    val h = (64 + 8 * (cid % 3)).toInt
    (a, b, c, w, h)
  }

  /** Render doc `id`'s synthetic gray pattern. */
  def synthGray(id: Long): (Int, Int, Array[Int]) = {
    val (a, b, c, w, h) = synthParams(id)
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        gray(y * w + x) = (a * x + b * y) % 240 + c
        x += 1
      }
      y += 1
    }
    (w, h, gray)
  }

  /** One real PNG payload per id — the ingest stand-in for an image
    * corpus (the container ships no image files, so the corpus is
    * generated; the DECODE path the queries exercise is the production
    * javax.imageio one). Narrow mapPartitions over the id column. */
  def synthImageTable(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    // Fan the (8-byte) id rows out to full core parallelism first: the
    // encode — and the decode stage that chains narrowly onto it — is
    // CPU-bound, and the id list inherits the source table's file count
    // (e.g. 10 parquet files → 10 tasks → 2/3 of a 32-core box idle
    // through the whole codec stage). The shuffle moves ids, never
    // payloads.
    ids.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { id =>
          val (w, h, gray) = synthGray(id)
          ImageRow(id, encodeGrayPng(w, h, gray))
        }
      }.toDF()
  }
}
