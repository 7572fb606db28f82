package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MultimodalOps, PerceptualHash}
import graft.multimodal.MultimodalOps.MediaRow

/** Video near-dup by temporally-aligned perceptual frame hashes: the
  * constellation matcher applied to per-frame dhash band tokens. */
class VideoNearDupSpec extends SparkTestBase {

  private def raster(seed: Long, frame: Int, w: Int = 18, h: Int = 13,
                     bump: Int = 0): MediaRow = {
    val vs = (seed * 2654435761L) % 65521L
    val luma = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      val v = (vs * 31 + frame * 97 + x * x * 7 + y * y * 13 + x * y * 5 +
        x * vs * 3 + y * frame * 11) % 256
      (if (i == 0) (v + bump) % 256 else v).toByte
    }
    MediaRow(seed * 1000 + frame, luma, "raster8", w, h)
  }

  /** frames table (video_id, frame_idx, dhash) for a video made of
    * the given (frame-formula-index, bump) list. */
  private def video(vid: Long, seed: Long,
                    fs: Seq[(Int, Int)]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val media = spark.createDataset(fs.zipWithIndex.map { case ((ft, b), fi) =>
      (vid, fi, raster(seed, ft, bump = b))
    })
    PerceptualHash.phashes(media.map(_._3))
      .join(media.toDF("video_id", "frame_idx", "m")
        .select(col("video_id"), col("frame_idx"),
          col("m.media_id").as("media_id")), "media_id")
      .select("video_id", "frame_idx", "dhash")
  }

  test("a one-frame-shifted copy matches at offset −1 with 4 tokens per shared frame pair") {
    val a = video(1L, 7L, (0 until 5).map((_, 0)))
    val b = video(2L, 7L, Seq((99, 0)) ++ (0 until 5).map((_, 0)))
    val c = video(3L, 123L, (0 until 5).map((_, 0)))
    val frames = a.union(b).union(c)
    val pairs = PerceptualHash.videoNearDup(frames, minMatches = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // 5 shared frames = 4 consecutive pairs × 4 bands
    assert(pairs.toSeq === Seq((1L, 2L, -1, 16L)))
  }

  test("a single-pixel-perturbed frame still matches on its unchanged bands") {
    // same video, frame 2 bumped by one grey level in one pixel: the
    // two frame-pairs touching frame 2 keep their unperturbed bands'
    // tokens; pairs (0,1) and (3,4) keep all 4
    val a = video(1L, 9L, (0 until 5).map((_, 0)))
    val b = video(2L, 9L, (0 until 5).map(f => (f, if (f == 2) 1 else 0)))
    val pairs = PerceptualHash.videoNearDup(a.union(b), minMatches = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(pairs.length === 1)
    val (ai, bi, off, n) = pairs.head
    assert((ai, bi, off) === ((1L, 2L, 0)))
    assert(n >= 12L && n <= 16L,
      s"expected 8 clean + most of the two perturbed pairs' bands: $n")
  }

  test("undecodable frames emit no tokens when the decoded flag is present") {
    import spark.implicits._
    // two unrelated videos each carrying a run of 3 undecodable frames
    // (decoded=false, dhash=0) — without the filter, the aligned
    // zero-hash pair tokens would clear minMatches=8 (2 pairs × 4
    // bands) and pair them
    val a = video(1L, 7L, (0 until 3).map((_, 0)))
      .withColumn("decoded", lit(true))
    val b = video(2L, 123L, (0 until 3).map((_, 0)))
      .withColumn("decoded", lit(true))
    def junk(vid: Long) = (3 to 5).map(f => (vid, f, 0L, false))
      .toDF("video_id", "frame_idx", "dhash", "decoded")
    val frames = a.union(junk(1L)).union(b).union(junk(2L))
    assert(PerceptualHash.videoNearDup(frames, minMatches = 8).count() === 0L,
      "zero-hash runs from undecodable frames must not pair videos")
    // and dropping the flag column reproduces the documented hazard —
    // callers without it must pre-filter
    assert(PerceptualHash.videoNearDup(frames.drop("decoded"),
      minMatches = 8).count() === 1L)
  }

  test("the hot-token cap suppresses corpus-wide boilerplate sequences") {
    import spark.implicits._
    // 8 unrelated videos all ending in the SAME two-frame title card
    // (a single shared frame yields no token at all under pair
    // tokens — its neighbors differ per video; two consecutive shared
    // frames yield exactly one shared pair × 4 bands)
    val vids = (1L to 8L).map { v =>
      video(v, v * 31L, Seq((0, 0), (1, 0))) // distinct content
        .union(video(v, 999L, Seq((5, 0), (6, 0)))
          .withColumn("video_id", lit(v))
          .withColumn("frame_idx", col("frame_idx") + 2)
          .select("video_id", "frame_idx", "dhash"))
    }.reduce(_ union _)
    val capped = PerceptualHash.videoNearDup(vids, minMatches = 1,
      maxTokenFreq = 4L)
    assert(capped.count() === 0L,
      "the card's tokens (freq 8 > cap 4) must not pair unrelated videos")
    val open = PerceptualHash.videoNearDup(vids, minMatches = 1,
      maxTokenFreq = 1000L)
    assert(open.count() === 28L, "uncapped, the shared card pairs all 8·7/2")
  }
}
