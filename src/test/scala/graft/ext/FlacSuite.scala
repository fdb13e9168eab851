package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.SparkTest

/** Pure-JDK FLAC codec: exact round-trips over every subframe type and
  * stereo decorrelation mode the decoder supports, loud integrity
  * failures, and the Spark decode path. */
class FlacSuite extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def waveform(id: Long, n: Int): Array[Int] =
    Array.tabulate(n)(t => (((id * 31 + t.toLong * 7) % 2048) - 1024).toInt)

  test("mono round-trip is exact across FIXED / LPC / VERBATIM / escape modes") {
    // 300 samples = 3 frames (128+128+44): exercises the multi-frame walk
    // and a short last frame
    val s = waveform(7, 300)
    for (mode <- Seq(Flac.Fixed, Flac.Lpc, Flac.Verbatim, Flac.EscapeRice)) {
      val enc = Flac.encode(Array(s), 8000, mode)
      val dec = Flac.decode(enc)
      assert(dec.info.sampleRate == 8000)
      assert(dec.info.channels == 1)
      assert(dec.info.totalSamples == 300L)
      assert(dec.channels(0).toSeq == s.toSeq, s"mode $mode must be lossless")
    }
    // FIXED actually compresses this near-linear waveform; VERBATIM can't
    val fixed = Flac.encode(Array(s), 8000, Flac.Fixed)
    val verbatim = Flac.encode(Array(s), 8000, Flac.Verbatim)
    assert(fixed.length < verbatim.length,
      "rice-coded fixed-predictor frames must beat verbatim on smooth input")
  }

  test("constant input emits CONSTANT subframes and round-trips") {
    val s = Array.fill(200)(-123)
    val enc = Flac.encode(Array(s), 8000, Flac.Fixed)
    val dec = Flac.decode(enc)
    assert(dec.channels(0).toSeq == s.toSeq)
    // constant blocks collapse to a couple of bytes per frame
    assert(enc.length < 100, s"CONSTANT encoding should be tiny, got ${enc.length}")
  }

  test("stereo round-trips are exact in all decorrelation modes") {
    val l = waveform(3, 260)
    val r = waveform(11, 260)
    for (st <- Seq(Flac.Independent, Flac.LeftSide, Flac.RightSide, Flac.MidSide)) {
      val dec = Flac.decode(Flac.encode(Array(l, r), 44100, Flac.Fixed, st))
      assert(dec.info.channels == 2)
      assert(dec.info.sampleRate == 44100)
      assert(dec.channels(0).toSeq == l.toSeq, s"$st left")
      assert(dec.channels(1).toSeq == r.toSeq, s"$st right")
    }
  }

  test("extreme 16-bit samples survive every mode (wraparound residuals)") {
    val s = Array(-32768, 32767, -32768, 32767, 0, -1, 1, -32768, 32767, 0)
    for (mode <- Seq(Flac.Fixed, Flac.Lpc, Flac.Verbatim, Flac.EscapeRice)) {
      assert(Flac.decode(Flac.encode(Array(s), 8000, mode))
        .channels(0).toSeq == s.toSeq, s"mode $mode")
    }
  }

  test("corruption fails loudly: flipped bits, bad magic, truncation") {
    val enc = Flac.encode(Array(waveform(5, 200)), 8000)
    // flip a byte in the LAST frame's payload — CRC-16 or MD5 must catch it
    val corrupt = enc.clone()
    corrupt(enc.length - 5) = (corrupt(enc.length - 5) ^ 0x55).toByte
    assert(intercept[Exception](Flac.decode(corrupt)) != null)
    // bad magic
    val badMagic = enc.clone(); badMagic(0) = 'X'.toByte
    assert(intercept[Exception](Flac.decode(badMagic)).getMessage
      .contains("magic"))
    // truncated mid-frame
    assert(intercept[Exception](
      Flac.decode(java.util.Arrays.copyOf(enc, enc.length - 3))) != null)
    // MD5 that disagrees with the samples (frame CRCs intact)
    val badMd5 = enc.clone()
    badMd5(8 + 18) = (badMd5(8 + 18) ^ 0x01).toByte // first MD5 byte
    val e = intercept[Exception](Flac.decode(badMd5))
    assert(e.getMessage.contains("MD5") || e.getMessage.contains("CRC"))
  }

  test("flacFeatures over the Spark path matches the analytic expectation") {
    import spark.implicits._
    val docs = (0L until 25L).toDF("doc_id")
    val feats = Flac.flacFeatures(Flac.synthesizeFlacAudio(docs, "doc_id"))
      .collect().map(f => f.id -> f).toMap
    assert(feats.size == 25)
    for (id <- 0L until 25L) {
      val n = ((id % 5) + 1).toInt * 80
      val s = waveform(id, n)
      val f = feats(id)
      assert(f.sampleRate == 8000 && f.channels == 1)
      assert(f.nSamples == n.toLong)
      assert(math.abs(f.durationMs - n.toDouble / 8.0) < 1e-9)
      val rms = math.sqrt(s.map(v => v.toDouble * v.toDouble).sum / n)
      assert(math.abs(f.rms - rms) < 1e-9, s"id $id rms")
    }
  }
}
