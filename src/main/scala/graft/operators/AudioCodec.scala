package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

/** Real audio decode + energy-envelope fingerprinting over binary payload
  * columns — the audio twin of [[ImageCodec]], built on the same recipe:
  *
  *  - the decode is REAL: WAV/PCM payloads parse into 16-bit sample
  *    arrays inside a narrow mapPartitions — the codec slot
  *    [[Multimodal.featurize]] reserves. Canonical PCM goes through a
  *    pure lock-free RIFF walk (AudioSystem serializes provider lookup
  *    process-wide — see [[decodePcm]]); everything else falls back to
  *    `javax.sound.sampled` (pure JDK), which also cross-checks the fast
  *    path bit-for-bit in AudioCodecSpec;
  *  - on the decoded samples sits a 64-bit energy-envelope fingerprint
  *    (the time-domain member of the acoustic-fingerprint family — cf. the
  *    spectral variants in Haitsma & Kalker's classic scheme / Chromaprint):
  *    pool the samples into 64 equal-duration frames, bit k set when frame
  *    k's energy exceeds the mean frame energy. As integer math:
  *    `frameEnergy(k) * 64 > totalEnergy` — exact, bit-deterministic, and
  *    invariant under uniform GAIN (both sides scale by g², so a louder
  *    copy of the same recording hashes identically);
  *  - the 64-bit signature rides the UNCHANGED SimHash banding machinery
  *    (Dedup.simhashPairsFromSigs) for audio near-dup pairs, exactly as
  *    image aHash does: at 100 TB payloads decode where they sit and only
  *    8-byte signatures travel to the pair join.
  *
  * All arithmetic is exact integer (sample values are 16-bit ints, frame
  * boundaries are floor divisions, energies are Long sums of squares), so
  * the DuckDB oracle replays the synthetic corpus' waveform formula and
  * the pooling algebra in SQL and checks encode → decode → pool → hash
  * bit for bit — WAV encode/decode drops out because PCM is lossless.
  *
  * Reference note: the reference pipeline has no audio path (it is a CDK
  * ETL template); this family exists for the training-data-pipeline scope
  * SURVEY §2 adds (multimodal corpora dedup/curation).
  */
object AudioCodec {

  final case class AudioRow(doc_id: Long, payload: Array[Byte])
  final case class AudioFpRow(doc_id: Long, sample_rate: Long,
                              n_samples: Long, energy: Long, fp: Long)

  /** Magic-byte sniff: RIFF....WAVE — only plausible WAV containers reach
    * AudioSystem (reader discovery on arbitrary bytes costs a registry
    * scan per row; the media schema also carries text/image payloads). */
  def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Decode a WAV payload to (sampleRate, 16-bit PCM samples).
    *
    * Canonical PCM containers (RIFF + "fmt " tag 1 + 16-bit) decode
    * through [[decodeCanonicalWav]] — a pure, lock-free RIFF chunk walk.
    * That is not an optimization nicety but a scale requirement:
    * AudioSystem's provider registry serializes EVERY getAudioInputStream
    * call process-wide, and 32 executor threads hammering it decode ~30×
    * slower per payload than one thread (measured: 2 000 decodes 0.12 s
    * single-threaded, 16×2 000 in 3.54 s on 16 threads — the audio scan
    * at 100× bench scale ran minutes instead of seconds). Anything the
    * fast path declines (compressed WAV, odd layouts) falls back to the
    * real javax.sound.sampled decode, and AudioCodecSpec pins the two
    * paths bit-identical on round-trip corpora. */
  def decodePcm(payload: Array[Byte]): Option[(Int, Array[Int])] =
    decodeCanonicalWav(payload).orElse(decodePcmViaAudioSystem(payload))

  /** Pure RIFF walk for the canonical case: "fmt " declares plain PCM
    * (tag 1) at 16 bits; samples are little-endian, channel 0 kept.
    * None on anything else — the AudioSystem fallback owns those. */
  private[graft] def decodeCanonicalWav(
      p: Array[Byte]): Option[(Int, Array[Int])] = {
    if (!looksLikeWav(p)) return None
    def le16(o: Int): Int = (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8)
    def le32(o: Int): Int = (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8) |
      ((p(o + 2) & 0xFF) << 16) | ((p(o + 3) & 0xFF) << 24)
    var off = 12
    var fmtTag = -1
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= p.length && dataLen < 0) {
      val size = le32(off + 4)
      if (size < 0 || off + 8 + size > p.length) return None // truncated
      if (p(off) == 'f' && p(off + 1) == 'm' && p(off + 2) == 't' &&
          p(off + 3) == ' ' && size >= 16) {
        fmtTag = le16(off + 8)
        channels = le16(off + 10)
        sampleRate = le32(off + 12)
        bits = le16(off + 22)
      } else if (p(off) == 'd' && p(off + 1) == 'a' && p(off + 2) == 't' &&
          p(off + 3) == 'a') {
        dataOff = off + 8
        dataLen = size
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (fmtTag != 1 || bits != 16 || channels < 1 || sampleRate <= 0 ||
        dataOff < 0) return None
    val frameBytes = 2 * channels
    val n = dataLen / frameBytes
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val o = dataOff + i * frameBytes // channel 0 of frame i
      out(i) = (p(o + 1).toInt << 8) | (p(o) & 0xFF)
      i += 1
    }
    Some((sampleRate, out))
  }

  /** The general decode: real javax.sound.sampled parsing. Mono
    * PCM_SIGNED 16-bit streams decode directly (both endiannesses);
    * multi-channel streams keep channel 0 (fingerprints are
    * per-recording, not per-channel). None when the bytes aren't a
    * decodable WAV. NOTE: AudioSystem serializes provider lookup
    * process-wide — this is the fallback path, not the scan path. */
  private[graft] def decodePcmViaAudioSystem(
      payload: Array[Byte]): Option[(Int, Array[Int])] = {
    if (!looksLikeWav(payload)) return None
    try {
      val ais: AudioInputStream =
        AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt: AudioFormat = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) return None
        val channels = fmt.getChannels
        val bytes = ais.readAllBytes()
        val frameBytes = 2 * channels
        val n = bytes.length / frameBytes
        val out = new Array[Int](n)
        val big = fmt.isBigEndian
        var i = 0
        while (i < n) {
          val off = i * frameBytes // channel 0 of frame i
          val lo = bytes(off + (if (big) 1 else 0)) & 0xFF
          val hi = bytes(off + (if (big) 0 else 1)).toInt
          out(i) = (hi << 8) | lo
          i += 1
        }
        Some((fmt.getSampleRate.toInt, out))
      } finally ais.close()
    } catch { case _: Exception => None } // UnsupportedAudioFileException etc.
  }

  /** Encode 16-bit mono samples as a canonical 44-byte-header PCM WAV —
    * the exact inverse of [[decodePcm]]. Written directly (pure, no
    * AudioSystem: its write path takes the same process-wide lock as its
    * read path); AudioCodecSpec pins that javax.sound.sampled decodes
    * this encoder's output to the identical samples, so the container
    * stays interoperable, not a private format. */
  def encodeWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                         // PCM
      .putShort(1)                         // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)              // byte rate
      .putShort(2)                         // block align
      .putShort(16)                        // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) {
      buf.putShort(samples(i).toShort)
      i += 1
    }
    buf.array()
  }

  /** 64-bit energy-envelope fingerprint + total energy: pool samples into
    * 64 equal-duration frames (frame of sample t is `t·64/n`, the same
    * floor-boundary pooling as ImageCodec.poolSums), frame energy is the
    * Long sum of squared samples, bit k set when
    * `frameEnergy(k) * 64 > totalEnergy` (strict, like ahash64's mean
    * comparison — gain-invariant because both sides scale by g²). */
  def energyFp64(samples: Array[Int]): (Long, Long) = {
    val n = samples.length
    if (n == 0) return (0L, 0L)
    val frames = new Array[Long](64)
    var t = 0
    while (t < n) {
      val s = samples(t).toLong
      frames((t.toLong * 64 / n).toInt) += s * s
      t += 1
    }
    var total = 0L
    var k = 0
    while (k < 64) { total += frames(k); k += 1 }
    (envelopeBits(frames, total), total)
  }

  /** The envelope's bit decisions: bit k set when frame k's energy
    * exceeds the mean — mathematically `frames(k) * 64 > total`, computed
    * as `frames(k) > total / 64` (floor): for non-negative energies the
    * two are exactly equivalent (a·64 > b ⟺ a ≥ ⌊b/64⌋+1 ⟺ a > ⌊b/64⌋),
    * but the division form cannot overflow, while the product form
    * silently flips bits once a frame's energy crosses 2^57 — hours of
    * near-full-scale audio, beyond the synthetic corpus but not beyond
    * real recordings. Gain invariance is untouched: the equivalence is
    * exact, so scaling every energy by g² still flips no comparison. */
  private[graft] def envelopeBits(frames: Array[Long], total: Long): Long = {
    val mean = total / 64L
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (frames(k) > mean) sig |= (1L << k)
      k += 1
    }
    sig
  }

  /** Decode each payload and emit its fingerprint + real decoded
    * properties — one narrow mapPartitions (payloads never shuffle).
    * Undecodable payloads are dropped. */
  def fingerprint(audio: DataFrame): Dataset[AudioFpRow] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.as[AudioRow].mapPartitions { it =>
      it.flatMap { r =>
        decodePcm(r.payload).map { case (sr, samples) =>
          val (fp, energy) = energyFp64(samples)
          AudioFpRow(r.doc_id, sr.toLong, samples.length.toLong, energy, fp)
        }
      }
    }
  }

  // ---- deterministic synthetic audio -----------------------------------

  /** Synthetic-corpus parameters for doc `id`: docs with id % 20 == 1 are
    * PLANTED near-duplicates of id-1 — the same waveform at exactly twice
    * the gain, which the energy-envelope hash maps to the IDENTICAL
    * signature (energies scale by exactly 4 on both sides of every frame
    * comparison). Base amplitude stays within ±8192 so the doubled copy
    * never clips 16-bit. n is always a multiple of 64 so frames divide
    * evenly (the same even-grid choice the image corpus makes). */
  def synthParams(id: Long): (Long, Long, Int, Int) = {
    val dup = id % 20 == 1
    val cid = if (dup) id - 1 else id
    val a = cid % 127 + 1
    val b = cid % 113 + 1
    val n = 4096 + 64 * (cid % 17).toInt
    val gain = if (dup) 2 else 1
    (a, b, n, gain)
  }

  /** Render doc `id`'s synthetic waveform: an integer sawtooth with a
    * quadratic-residue jitter term (aperiodic enough that frame energies
    * differ doc to doc), `v(t) = (((a·t + b·(t² mod 911)) mod 16384) −
    * 8192) · gain` — pure integer, replayable verbatim in SQL. */
  def synthSamples(id: Long): Array[Int] = {
    val (a, b, n, gain) = synthParams(id)
    val out = new Array[Int](n)
    var t = 0
    while (t < n) {
      val v = ((a * t + b * ((t.toLong * t) % 911)) % 16384 - 8192).toInt
      out(t) = v * gain
      t += 1
    }
    out
  }

  val SynthSampleRate = 16000

  /** One real WAV payload per id — the ingest stand-in for an audio corpus
    * (the container ships no audio files; the DECODE path the queries
    * exercise is the production javax.sound.sampled one). Ids fan out to
    * full core parallelism before the CPU-bound codec, exactly like
    * ImageCodec.synthImageTable — the shuffle moves 8-byte ids, never
    * payloads. */
  def synthAudioTable(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map(id => AudioRow(id, encodeWav(SynthSampleRate, synthSamples(id))))
      }.toDF()
  }
}
