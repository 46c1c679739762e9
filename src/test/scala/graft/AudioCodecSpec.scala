package graft

import graft.operators.{AudioCodec, Dedup, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real WAV decode + energy-envelope fingerprinting. The codec path is
  * the production one (javax.sound.sampled); the synthetic corpus only
  * supplies payloads. */
class AudioCodecSpec extends AnyFunSuite with SparkSpec {

  test("property: ARBITRARY 16-bit sample streams round-trip through both decode paths") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val samplesGen = Gen.nonEmptyListOf(Gen.chooseNum(-32768, 32767))
    val rateGen = Gen.oneOf(8000, 16000, 22050, 44100)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100),
      Prop.forAll(samplesGen, rateGen) { (xs, sr) =>
        val samples = xs.toArray
        val wav = AudioCodec.encodeWav(sr, samples)
        val fast = AudioCodec.decodeCanonicalWav(wav)
        val real = AudioCodec.decodePcmViaAudioSystem(wav)
        fast.exists { case (r, got) => r == sr && got.sameElements(samples) } &&
          real.exists { case (r, got) => r == sr && got.sameElements(samples) }
      })
    assert(res.passed, res.status.toString)
  }

  test("WAV encode/decode round-trips samples and rate exactly") {
    val samples = Array.tabulate(1000)(t => ((t * 37) % 16384) - 8192)
    val wav = AudioCodec.encodeWav(16000, samples)
    assert(AudioCodec.looksLikeWav(wav))
    val Some((sr, got)) = AudioCodec.decodePcm(wav)
    assert(sr == 16000)
    assert(got.sameElements(samples), "PCM must round-trip bit-exactly")
  }

  test("fast RIFF path and javax.sound.sampled decode bit-identically") {
    // both directions: our encoder's output through AudioSystem, and the
    // canonical walker against AudioSystem on the same payloads — the
    // lock-free scan path must be indistinguishable from the real codec
    (0L until 50L).foreach { id =>
      val wav = AudioCodec.encodeWav(16000, AudioCodec.synthSamples(id))
      val fast = AudioCodec.decodeCanonicalWav(wav)
      val real = AudioCodec.decodePcmViaAudioSystem(wav)
      assert(fast.isDefined && real.isDefined)
      assert(fast.get._1 == real.get._1)
      assert(fast.get._2.sameElements(real.get._2),
        s"fast and AudioSystem decode diverge on doc $id")
    }
  }

  test("fast RIFF path declines non-canonical containers (fallback owns them)") {
    // a WAV declaring a non-PCM format tag must go to AudioSystem, not
    // be mis-parsed: flip the fmt tag in a valid container
    val wav = AudioCodec.encodeWav(16000, AudioCodec.synthSamples(1L))
    wav(20) = 3 // fmt tag 3 = IEEE float
    assert(AudioCodec.decodeCanonicalWav(wav).isEmpty)
    // truncated data chunk must be declined, not over-read
    val cut = java.util.Arrays.copyOf(wav, wav.length - 10)
    assert(AudioCodec.decodeCanonicalWav(cut).isEmpty)
  }

  test("non-WAV bytes are rejected, not mis-decoded") {
    assert(AudioCodec.decodePcm("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decodePcm(Array[Byte]()).isEmpty)
    // RIFF magic but garbage body must not throw
    assert(AudioCodec.decodePcm("RIFFxxxxWAVEgarbage".getBytes("UTF-8")).isEmpty)
  }

  test("energy fingerprint is exactly invariant under uniform gain") {
    val base = AudioCodec.synthSamples(42L)
    val loud = base.map(_ * 2)
    assert(AudioCodec.energyFp64(base)._1 == AudioCodec.energyFp64(loud)._1)
  }

  test("planted gain-doubled near-dups hash identically through the REAL codec") {
    (1L to 200L).filter(_ % 20 == 1).foreach { id =>
      val fpDup = AudioCodec.energyFp64(
        AudioCodec.decodePcm(AudioCodec.encodeWav(16000, AudioCodec.synthSamples(id))).get._2)._1
      val fpBase = AudioCodec.energyFp64(
        AudioCodec.decodePcm(AudioCodec.encodeWav(16000, AudioCodec.synthSamples(id - 1))).get._2)._1
      assert(fpDup == fpBase, s"doc $id must hash identically to ${id - 1}")
    }
  }

  test("signatures are varied — the corpus doesn't collapse to few fingerprints") {
    val nonDup = (0L until 300L).filterNot(_ % 20 == 1)
    val fps = nonDup.map(id => AudioCodec.energyFp64(AudioCodec.synthSamples(id))._1)
    assert(fps.distinct.size > nonDup.size * 9 / 10,
      s"expected mostly-distinct fingerprints, got ${fps.distinct.size} of ${nonDup.size}")
  }

  test("banding recall: simhashPairsFromSigs == brute force over audio fingerprints") {
    import spark.implicits._
    val ids = (0L until 200L)
    val fps = ids.map(id => id -> AudioCodec.energyFp64(AudioCodec.synthSamples(id))._1)
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    val got = Dedup.simhashPairsFromSigs(
        fps.toDF("doc_id", "sig"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    // the planted dups are in there at hamming 0
    assert(brute.exists { case (a, b, h) => b == a + 1 && b % 20 == 1 && h == 0 })
  }

  test("fingerprint dataset decodes through the codec end-to-end") {
    import spark.implicits._
    val wavs = AudioCodec.synthAudioTable((0L until 50L).toDF("doc_id"))
    val rows = AudioCodec.fingerprint(wavs).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.sample_rate == 16000L)
      val (_, _, n, _) = AudioCodec.synthParams(r.doc_id)
      assert(r.n_samples == n.toLong)
      assert(r.fp == AudioCodec.energyFp64(AudioCodec.synthSamples(r.doc_id))._1)
    }
  }

  test("featurize reports REAL decoded audio properties for WAV payloads") {
    import spark.implicits._
    val samples = AudioCodec.synthSamples(7L)
    val media = Seq((7L, "audio", AudioCodec.encodeWav(16000, samples)))
      .toDF("doc_id", "fmt", "payload")
    val m = Multimodal.featurize(media).collect().head
    assert(m.width == 16000L, "width carries the real sample rate")
    assert(m.height == 16L, "height carries bits per sample")
    assert(m.n_frames == samples.length.toLong, "n_frames carries the real sample count")
  }

  test("envelope bit decisions survive frame energies past 2^57 (no Long overflow)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    // reference decision in BigInt — immune to overflow by construction
    def ref(frames: Array[Long], total: BigInt): Long = {
      var sig = 0L
      frames.indices.foreach { k =>
        if (BigInt(frames(k)) * 64 > total) sig |= (1L << k)
      }
      sig
    }
    // explicit regression: hours-of-loud-audio scale energies, where the
    // old `frames(k) * 64L > total` product wrapped negative and silently
    // cleared bits that are genuinely above the mean
    val hot = Array.fill(64)(1L << 40)
    hot(5) = (1L << 58) + 7L   // * 64 overflows Long
    hot(6) = 1L << 57
    val hotTotal = hot.foldLeft(BigInt(0))(_ + _)
    assert(hotTotal.isValidLong, "totals at this scale still fit a Long")
    assert(AudioCodec.envelopeBits(hot, hotTotal.toLong) == ref(hot, hotTotal),
      "huge-but-valid frame energies must keep exact mean comparisons")
    // property: the division form equals the BigInt product form for ANY
    // non-negative energies whose total fits a Long
    val frameGen = Gen.oneOf(
      Gen.chooseNum(0L, 1000L),
      Gen.chooseNum(0L, (1L << 50)),
      Gen.chooseNum((1L << 52), (1L << 57) - 1))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(Gen.containerOfN[Array, Long](64, frameGen)) { frames =>
        val total = frames.foldLeft(BigInt(0))(_ + _)
        total.isValidLong ==> // 64 frames < 2^57 always fit; keep the guard honest
          (AudioCodec.envelopeBits(frames, total.toLong) == ref(frames, total))
      })
    assert(res.passed, res.status.toString)
  }
}
