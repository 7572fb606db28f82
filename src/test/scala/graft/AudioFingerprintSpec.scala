package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.MediaRow
import graft.operators.AudioFingerprint

/** Constellation audio fingerprinting: integer-exact DFT signatures,
  * shift-invariant tokens, offset-agreement scoring, and the
  * hot-token cap's stated recall trade. */
class AudioFingerprintSpec extends SparkTestBase {

  private def tone(bin: Int, frames: Int, amp: Int = 10000): Array[Int] =
    Array.tabulate(frames * AudioFingerprint.FrameSize) { i =>
      Math.round(StrictMath.sin(
        2.0 * StrictMath.PI * bin * i / AudioFingerprint.FrameSize) * amp).toInt
    }

  private def wav(id: Long, samples: Array[Int]): MediaRow =
    MediaRow(id, MultimodalOps.synthWavPcm16(8000, samples), "wav", 0, 0)

  private def chirp(seed: Long, frames: Int): Array[Int] =
    Array.tabulate(frames * AudioFingerprint.FrameSize) { i =>
      (((seed * 7919L + i.toLong * 104729L + seed * i.toLong * 31L +
        i.toLong * i.toLong * 517L) % 65536L) - 32768L).toInt
    }

  test("a pure tone's top spectral bin is the tone's bin, every frame") {
    for (bin <- Seq(2, 5, 11)) {
      val s = tone(bin, 2)
      for (f <- 0 until 2) {
        val sig = AudioFingerprint.frameSig(s, f * AudioFingerprint.FrameSize)
        assert((sig >> 8) === bin, s"bin $bin frame $f: sig=0x${sig.toHexString}")
      }
    }
  }

  test("digital silence ties break to bins 1,2,3") {
    val sig = AudioFingerprint.frameSig(
      new Array[Int](AudioFingerprint.FrameSize), 0)
    assert(sig === 0x123)
  }

  test("frameSigs through the REAL decode path equals frameSig on the raw lattice") {
    import spark.implicits._
    val raw = chirp(42L, 4)
    val viaDecode = AudioFingerprint.frameSigs(
        spark.createDataset(Seq(wav(1L, raw))))
      .collect().sortBy(_.frame).map(_.sig)
    val direct = (0 until 4)
      .map(f => AudioFingerprint.frameSig(raw, f * AudioFingerprint.FrameSize))
    assert(viaDecode.toSeq === direct)
  }

  test("a shifted embedded copy matches at the shift offset with full token count") {
    import spark.implicits._
    val f = 6
    val a = chirp(7L, f)
    // b: two frames of unrelated prefix + a verbatim — a 2-frame shift
    val b = chirp(900L, 2) ++ a
    val c = chirp(555L, f) // unrelated
    val media = spark.createDataset(Seq(wav(1L, a), wav(2L, b), wav(3L, c)))
    val pairs = AudioFingerprint.nearDup(media, minMatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val planted = pairs.filter(p => p._1 == 1L && p._2 == 2L)
    assert(planted.length === 1)
    // every a-side token (3F−6 of them) recurs in b at offset −2
    assert(planted.head._3 === -2)
    assert(planted.head._4 === (3 * f - 6).toLong)
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"unrelated media matched: ${pairs.toSeq}")
  }

  test("the corpus-size-aware cap floors at benchmark scale and scales " +
      "past the 26-bit token space's expectation") {
    // small corpus: expectation ≪ 1 → the floor wins
    assert(AudioFingerprint.deriveMaxTokenFreq(1000000L, 20.0) === 1000L)
    // 10⁹ media × ~20 tokens: E[freq] ≈ 2·10¹⁰/2²⁶ ≈ 298 — the regime
    // the fixed cap 1000 silently admitted; headroom 64 scales the cap
    // to track expectation instead
    val big = AudioFingerprint.deriveMaxTokenFreq(1000000000L, 20.0)
    val expected = 1e9 * 20.0 / math.pow(2.0, 26)
    assert(big === math.ceil(64.0 * expected).toLong && big > 1000L)
    // per-media token count honors the fanout geometry
    assert(AudioFingerprint.tokensPerMedia(6, fanout = 3) === 12.0)
    assert(AudioFingerprint.tokensPerMedia(2, fanout = 3) === 1.0)
  }

  test("the hot-token cap drops degenerate tokens BEFORE the join (stated recall trade)") {
    import spark.implicits._
    // ten identical recordings: every token is carried by all ten
    val s = chirp(3L, 5)
    val media = spark.createDataset((1L to 10L).map(wav(_, s)))
    val capped = AudioFingerprint.nearDup(media, minMatches = 1,
      maxTokenFreq = 5L)
    assert(capped.count() === 0L, "cap 5 must kill tokens seen in 10 media")
    val open = AudioFingerprint.nearDup(media, minMatches = 1,
      maxTokenFreq = 1000L)
    assert(open.count() === 45L, "all 10·9/2 identical pairs must surface")
  }

  test("undecodable and sub-frame payloads yield no fingerprints (media is data)") {
    import spark.implicits._
    val junk = MediaRow(1L, Array[Byte](1, 2, 3, 4, 5), "wav", 0, 0)
    val short = wav(2L, Array.fill(AudioFingerprint.FrameSize - 1)(100))
    val rows = AudioFingerprint.frameSigs(
      spark.createDataset(Seq(junk, short))).count()
    assert(rows === 0L)
  }

  test("matchPairs is aggregation-shaped: no window, token equi-join") {
    import spark.implicits._
    val media = spark.createDataset(Seq(wav(1L, chirp(1L, 5)),
      wav(2L, chirp(2L, 5))))
    val tk = AudioFingerprint.tokens(media).toDF()
    val plan = AudioFingerprint.matchPairs(tk, tk, 1)
      .queryExecution.optimizedPlan.toString()
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
  }
}
