package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps.MediaRow

/** Perceptual image hashing (aHash/dHash — the pHash-family fingerprints
  * web-scale pipelines use for image near-dedup) + Hamming-banded
  * near-duplicate pairing: the image-side analogue of
  * SimHash-over-text, built on the same decode path as the rest of the
  * multimodal family (bomb-guarded `javax.imageio` luminance plane;
  * raster8 payloads fall back to their declared geometry, so the hash
  * is defined for both encoded images and raw planes).
  *
  * All arithmetic is integer (nearest-neighbor index resampling,
  * integer mean, bit packing) — deterministic on any engine, the x71
  * exactness stance.
  *
  * Scale shape: hashing is mapPartitions, zero shuffle. Near-dup
  * candidate generation splits the 64-bit hash into four 16-bit bands
  * (any shared band ⇒ candidate — catches every pair with Hamming
  * distance ≤ 3 exactly, and most up to ~10), one band-keyed
  * self-join of a 4×-exploded hash table — the [[graft.operators.Dedup]]
  * LSH shape, never all-pairs; exact `bit_count(xor)` filters the
  * candidates.
  */
object PerceptualHash {

  /** Luminance plane: decoded image, else declared-geometry raster8
    * payload, else None. */
  def lumaPlane(media: Array[Byte], width: Int, height: Int,
                maxPixels: Long = 64L * 1024 * 1024): Option[(Int, Int, Array[Int])] =
    MultimodalOps.decodeImage(media, maxPixels) match {
      case Some(img) => Some((img.width, img.height, img.luma))
      case None =>
        if (media != null && width > 0 && height > 0 &&
          width.toLong * height <= maxPixels &&
          media.length >= width * height)
          Some((width, height,
            Array.tabulate(width * height)(i => media(i) & 0xff)))
        else None
    }

  /** Nearest-neighbor resample on integer index math — the same rule
    * as MultimodalOps.resize (`src[(y·h div oh)·w + (x·w div ow)]`). */
  private[multimodal] def resampleInt(src: Array[Int], w: Int, h: Int,
                                      ow: Int, oh: Int): Array[Int] =
    Array.tabulate(ow * oh) { i =>
      val y = i / ow; val x = i % ow
      src((y * h / oh) * w + (x * w / ow))
    }

  /** dHash: 9×8 resample, bit (y,x) = p(x+1,y) > p(x,y), packed
    * row-major MSB-first into one long (bit i = y·8+x at position
    * 63−i). */
  def dhash64(luma: Array[Int], w: Int, h: Int): Long = {
    val g = resampleInt(luma, w, h, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x))
          hash |= 1L << (63 - (y * 8 + x))
        x += 1
      }
      y += 1
    }
    hash
  }

  /** aHash: 8×8 resample, bit = p ≥ integer mean (Σ div 64), same
    * packing as [[dhash64]]. */
  def ahash64(luma: Array[Int], w: Int, h: Int): Long = {
    val g = resampleInt(luma, w, h, 8, 8)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += g(i); i += 1 }
    val mean = sum / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (g(i) >= mean) hash |= 1L << (63 - i)
      i += 1
    }
    hash
  }

  /** Per-image perceptual hashes: (media_id, decoded, dhash, ahash) —
    * mapPartitions, zero shuffle; undecodable rows carry
    * decoded=false and zero hashes. */
  def phashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      lumaPlane(r.media, r.width, r.height) match {
        case Some((w, h, luma)) =>
          (r.media_id, true, dhash64(luma, w, h), ahash64(luma, w, h))
        case None => (r.media_id, false, 0L, 0L)
      }
    }.toDF("media_id", "decoded", "dhash", "ahash")
  }

  /** Near-duplicate image pairs by banded dHash: explode each hash
    * into four 16-bit band keys, self-join on (band, value) with
    * idA < idB, distinct the candidates, keep exact Hamming ≤
    * `maxHamming`. Guaranteed complete for maxHamming ≤ 3 (pigeonhole
    * over 4 bands). Input: output of [[phashes]] (undecoded rows are
    * excluded — a zero hash is not a picture of anything). */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
                   hashCol: String = "dhash",
                   idCol: String = "media_id"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 16,
      s"banded candidates are complete only for small radii: $maxHamming")
    val bands = hashes.where(col("decoded"))
      .select(col(idCol), col(hashCol),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col(hashCol), 48 - 16 * b)
            .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("band", "band_val")))
    val a = bands.select(col(idCol).as("id_a"), col(hashCol).as("h_a"),
      col("band"), col("band_val"))
    val b = bands.select(col(idCol).as("id_b"), col(hashCol).as("h_b"),
      col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // --- Video near-dup (probe x128) --------------------------------
  // The temporal composition of this file's per-frame hashes with the
  // constellation matcher: a video is its sequence of sampled-frame
  // perceptual hashes, a re-encoded / trimmed / embedded copy is the
  // same hash sequence at a shifted frame offset — exactly the
  // structure [[graft.operators.Constellation.matchPairs]] scores.
  // Completes near-dup across the multimodal family: text
  // (MinHash/SimHash/spans), image (nearDupPairs above), audio
  // (AudioFingerprint x127), video (this).
  // -----------------------------------------------------------------

  /** Per-frame hashes → constellation tokens: band b of frame t pairs
    * with band b of frame t+1 — token = (band·2¹⁶ + bv_t)·2¹⁶ +
    * bv_{t+1}, 34 bits, t = the pair's first frame. Two design forces
    * meet here: band granularity (not the whole 64-bit hash) keeps a
    * single-pixel-perturbed frame matching on its UNCHANGED bands —
    * the [[nearDupPairs]] pigeonhole argument per frame — while the
    * consecutive-frame pairing keeps the token space from saturating
    * (a single frame's 16-bit band has only 262k values corpus-wide;
    * the first x128 sf1 honesty run measured the single-frame form at
    * 11.9× cost at 10× data from exactly that quadratic collision
    * growth — the audio path's sig-pair trick fixes the geometry).
    * Input: (idCol, frameCol, hashCol) rows, one per SAMPLED frame
    * (e.g. [[MultimodalOps.sampleVideoFrames]] → [[phashes]]).
    * Undecodable frames: when the input carries [[phashes]]'s
    * `decoded` flag it is honored — decoded=false rows emit no tokens
    * (the [[nearDupPairs]] stance: a zero hash is not a picture of
    * anything, and runs of undecodable frames in unrelated videos
    * would otherwise mint identical aligned pair tokens). Inputs
    * WITHOUT the flag must drop undecodable frames upstream. */
  def videoBandTokens(frames: DataFrame, idCol: String = "video_id",
                      frameCol: String = "frame_idx",
                      hashCol: String = "dhash"): DataFrame = {
    val decodable =
      if (frames.columns.contains("decoded")) frames.where(col("decoded"))
      else frames
    val bands = decodable.select(col(idCol).as("media_id"),
        col(frameCol).cast("int").as("t"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col(hashCol), 48 - 16 * b)
            .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("band", "bv")))
    val nxt = bands.select(col("media_id"), (col("t") - 1).as("t"),
      col("band"), col("bv").as("bv_next"))
    bands.join(nxt, Seq("media_id", "t", "band"))
      .select(col("media_id"), col("t"),
        ((col("band").cast("long") * 65536L + col("bv")) * 65536L +
          col("bv_next")).as("token"))
  }

  /** Video near-duplicate pairs by temporally-aligned frame hashes:
    * (a_id, b_id, offset, n_matches) where n_matches band-pair
    * tokens agree at one frame offset. A pair sharing F aligned
    * identical frames scores 4(F−1); `minMatches` = 8 demands two
    * aligned frame-PAIRS' worth, so one coincidentally-identical
    * frame (a shared black frame, a title card) — which contributes
    * no token at all unless its NEIGHBOR also matches — cannot pair
    * two videos, and the `maxTokenFreq` cap drops corpus-wide
    * boilerplate sequences before the join (same recall trade as the
    * audio matcher, stated there). */
  def videoNearDup(frames: DataFrame, minMatches: Int = 8,
                   maxTokenFreq: Long = 1000L,
                   idCol: String = "video_id",
                   frameCol: String = "frame_idx",
                   hashCol: String = "dhash"): DataFrame = {
    val tk = videoBandTokens(frames, idCol, frameCol, hashCol)
    graft.operators.Constellation.matchPairs(tk, tk, minMatches, maxTokenFreq)
      .where(col("a_id") < col("b_id"))
  }
}
