package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.MediaRow

/** Audio fingerprinting + near-duplicate detection — the AUDIO member
  * of the multimodal dedup family (images: perceptual hash x71/x89,
  * video containers: x68, text: the MinHash/SimHash/span stack). The
  * shape is the constellation approach of Wang 2003 ("An
  * Industrial-Strength Audio Search Algorithm", ISMIR): landmark
  * spectral peaks → (anchor, target, Δt) tokens → an inverted
  * token join scored by how many matches agree on one time OFFSET —
  * which is exactly an LSH-banding join relationally, so the 100 TB
  * plan is the x06 band-bucket shape: map-only fingerprinting, one
  * equi-join on the token, a bounded aggregation per candidate pair.
  *
  * Everything is INTEGER-EXACT so the DuckDB oracle (probe x127) can
  * re-derive the whole chain value-for-value:
  *   - frames are 32 non-overlapping samples on the 16-bit lattice
  *     (PCM16 round-trips exactly through [[MultimodalOps.decodeAudio]]'s
  *     power-of-two normalization; other depths quantize to the same
  *     lattice deterministically);
  *   - the DFT uses integer twiddles round(cos·512) / round(−sin·512)
  *     (StrictMath, so one bit pattern everywhere) — re/im are exact
  *     long sums, ORDER-FREE, |re| ≤ 32·2¹⁵·2⁹ = 2²⁹ and mag² ≤ 2⁵⁹,
  *     no overflow, no floating point anywhere;
  *   - a frame's signature is its top-3 bins by mag² (ties → lower
  *     bin) packed rank-major into 3 nibbles (bins 1..15, DC and
  *     Nyquist excluded);
  *   - a token pairs the signatures of frames t and t+Δt for
  *     Δt ∈ 1..fanout: token = (sigA·4096 + sigB)·4 + Δt — 26 bits,
  *     shift-INVARIANT (a duplicate embedded at any frame offset
  *     produces identical tokens at shifted t, which the offset
  *     agreement then exposes).
  *
  * This is a duplicate/containment detector for decoded audio content
  * (re-encoded copies, padded/trimmed copies, clips embedded in longer
  * recordings); robustness to lossy re-compression noise is explicitly
  * out of scope — that would trade the integer-exact certification for
  * heuristic smoothing, and exact-content audio dedup is what a
  * training-data pipeline needs first.
  */
object AudioFingerprint {

  val FrameSize = 32
  val Bins = 15 // k = 1..15; DC (k=0) and Nyquist (k=16) carry no phase
  val TwiddleScale = 512L
  val PeaksPerFrame = 3

  /** The token space is 26 bits (12-bit sig × 2 + 2-bit Δt). That is
    * ample at benchmark scale, but it SATURATES at very large corpora:
    * around 10⁸⁺ media at ~20 tokens each the expected per-token
    * frequency crosses into the regime where coincidental-collision
    * pair volume grows quadratically while sitting BELOW any fixed
    * `maxTokenFreq` cap. Use [[deriveMaxTokenFreq]] to scale the cap
    * with corpus size up to that boundary; past it, widen the token
    * geometry (a 4th peak, finer Δt — a new index `kind`) rather than
    * tuning the cap (see [[Constellation.deriveMaxTokenFreq]] for the
    * full argument). */
  val TokenSpaceBits = 26

  /** Fanout-aware expected tokens per media for a given frame count
    * (Σ_{dt=1..fanout} max(0, nFrames − dt)). */
  def tokensPerMedia(nFrames: Int, fanout: Int = 3): Double =
    (1 to fanout).map(dt => math.max(0, nFrames - dt)).sum.toDouble

  /** Corpus-size-aware hot-token cap for THIS token geometry —
    * [[Constellation.deriveMaxTokenFreq]] at 26 bits. */
  def deriveMaxTokenFreq(corpusMedia: Long, avgTokensPerMedia: Double,
                         headroom: Double = 64.0,
                         floor: Long = 1000L): Long =
    Constellation.deriveMaxTokenFreq(corpusMedia, avgTokensPerMedia,
      TokenSpaceBits, headroom, floor)

  /** Integer twiddle tables, flattened [k−1]·32 + n. StrictMath keeps
    * the bit pattern platform-independent; the x127 oracle embeds the
    * SAME values as a literal table. */
  lazy val (twCos, twSin): (Array[Long], Array[Long]) = {
    val c = new Array[Long](Bins * FrameSize)
    val s = new Array[Long](Bins * FrameSize)
    for (k <- 1 to Bins; n <- 0 until FrameSize) {
      val a = 2.0 * StrictMath.PI * k * n / FrameSize
      c((k - 1) * FrameSize + n) = Math.round(StrictMath.cos(a) * TwiddleScale)
      s((k - 1) * FrameSize + n) = Math.round(-StrictMath.sin(a) * TwiddleScale)
    }
    (c, s)
  }

  /** One frame's signature: exact-integer DFT magnitudes over bins
    * 1..15, top-3 by (mag² desc, bin asc), packed rank-major into
    * three nibbles. */
  def frameSig(samples: Array[Int], off: Int): Int = {
    val mag2 = new Array[Long](Bins + 1) // index by k, 1..Bins
    var k = 1
    while (k <= Bins) {
      val base = (k - 1) * FrameSize
      var re = 0L; var im = 0L; var n = 0
      while (n < FrameSize) {
        val v = samples(off + n).toLong
        re += v * twCos(base + n)
        im += v * twSin(base + n)
        n += 1
      }
      mag2(k) = re * re + im * im
      k += 1
    }
    var sig = 0
    val taken = new Array[Boolean](Bins + 1)
    var r = 0
    while (r < PeaksPerFrame) {
      var best = 0; var bestMag = -1L
      var b = 1
      while (b <= Bins) {
        if (!taken(b) && mag2(b) > bestMag) { bestMag = mag2(b); best = b }
        b += 1
      }
      taken(best) = true
      sig = (sig << 4) | best
      r += 1
    }
    sig
  }

  /** Decode a media payload to full frames on the 16-bit lattice
    * (channel 0 of interleaved streams). Exact for PCM16; other
    * depths quantize deterministically via round(v·2¹⁵). */
  private def decodeFrames(m: MediaRow): Option[(Array[Int], Int)] =
    MultimodalOps.decodeAudio(m.media).flatMap { a =>
      val nFrames = (a.nFrames / FrameSize).toInt
      if (nFrames <= 0) None
      else {
        val s = new Array[Int](nFrames * FrameSize)
        var i = 0
        while (i < s.length) {
          s(i) = Math.round(a.samples(i * a.channels) * 32768.0).toInt
          i += 1
        }
        Some((s, nFrames))
      }
    }

  final case class FrameSigRow(media_id: Long, frame: Int, sig: Int)
  final case class TokenRow(media_id: Long, t: Int, token: Long)

  /** Per-frame signatures — map-only (decode + integer DFT per media,
    * no shuffle). Undecodable or sub-frame-length payloads yield no
    * rows: malformed media is data, not an error. */
  def frameSigs(media: Dataset[MediaRow]): Dataset[FrameSigRow] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      decodeFrames(m) match {
        case None => Iterator.empty
        case Some((s, nFrames)) =>
          (0 until nFrames).iterator
            .map(f => FrameSigRow(m.media_id, f, frameSig(s, f * FrameSize)))
      }
    }
  }

  /** Constellation tokens, emitted in the same decode pass (the per-
    * media frame list is bounded by decodeAudio's maxSamples guard,
    * so holding it in memory is safe): for every anchor frame t and
    * Δt ∈ 1..fanout, token = (sig(t)·4096 + sig(t+Δt))·4 + Δt. */
  def tokens(media: Dataset[MediaRow], fanout: Int = 3): Dataset[TokenRow] = {
    require(fanout >= 1 && fanout <= 3, "fanout must be in 1..3")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      decodeFrames(m) match {
        case None => Iterator.empty
        case Some((s, nFrames)) =>
          val sigs = Array.tabulate(nFrames)(f => frameSig(s, f * FrameSize))
          for {
            t <- (0 until nFrames).iterator
            dt <- 1 to fanout
            if t + dt < nFrames
          } yield TokenRow(m.media_id,
            t, (sigs(t).toLong * 4096L + sigs(t + dt)) * 4L + dt)
      }
    }
  }

  /** Match two token relations (columns media_id, t, token) by time-
    * offset agreement — delegates to [[Constellation.matchPairs]],
    * the shared matcher behind the audio (x127) and video (x128)
    * near-dup operators; see its Scaladoc for the hot-token cap's
    * recall trade and the aggregation-only scale shape. */
  def matchPairs(a: DataFrame, b: DataFrame, minMatches: Int = 4,
                 maxTokenFreq: Long = 1000L): DataFrame =
    Constellation.matchPairs(a, b, minMatches, maxTokenFreq)

  /** Self near-dup over one corpus: the a<b half of [[matchPairs]]
    * applied to the corpus against itself. */
  def nearDup(media: Dataset[MediaRow], minMatches: Int = 4,
              fanout: Int = 3, maxTokenFreq: Long = 1000L): DataFrame = {
    val tk = tokens(media, fanout).toDF()
    matchPairs(tk, tk, minMatches, maxTokenFreq)
      .where(col("a_id") < col("b_id"))
  }
}
