package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.MediaRow
import graft.operators.{AudioFingerprint, Constellation}

/** The at-rest constellation token index: incremental media dedup
  * ingest — batch tokens match the persisted corpus tokens exactly as
  * they would match freshly-computed ones; geometry (kind) is pinned;
  * replays are marker-gated; compaction is read-equivalent. */
class ConstellationIndexSpec extends SparkTestBase {

  private def chirp(seed: Long, frames: Int): Array[Int] =
    Array.tabulate(frames * AudioFingerprint.FrameSize) { i =>
      (((seed * 7919L + i.toLong * 104729L + seed * i.toLong * 31L +
        i.toLong * i.toLong * 517L) % 65536L) - 32768L).toInt
    }

  private def wav(id: Long, samples: Array[Int]): MediaRow =
    MediaRow(id, MultimodalOps.synthWavPcm16(8000, samples), "wav", 0, 0)

  private def corpusTokens = {
    import spark.implicits._
    AudioFingerprint.tokens(spark.createDataset(
      (0L until 12L by 2L).map(i => wav(i, chirp(i, 6))))).toDF()
  }

  private def batchTokens = {
    import spark.implicits._
    // each batch item embeds corpus item id−1 after one silent frame
    AudioFingerprint.tokens(spark.createDataset(
      (1L until 12L by 2L).map(i =>
        wav(i, Array.fill(32)(0) ++ chirp(i - 1, 6))))).toDF()
  }

  private def render(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("offset"), r.getAs[Long]("n_matches")))
      .sortBy(t => (t._1, t._2)).toSeq

  test("match against the persisted index equals match against fresh tokens") {
    val dir = java.nio.file.Files.createTempDirectory("tokidx").toString
    val ct = corpusTokens
    Constellation.writeTokenIndex(ct.where(col("media_id") % 4 === 0),
      dir, "audio_dft32_v1")
    Constellation.appendToTokenIndex(ct.where(col("media_id") % 4 === 2),
      dir, "audio_dft32_v1", doneMarker = Some("b1"))
    // marked replay: gated, nothing lands
    Constellation.appendToTokenIndex(ct.where(col("media_id") % 4 === 2),
      dir, "audio_dft32_v1", doneMarker = Some("b1"))
    val viaIndex = render(Constellation.matchAgainstIndex(
      batchTokens, dir, "audio_dft32_v1", minMatches = 4))
    val direct = render(Constellation.matchPairs(
      batchTokens, ct, minMatches = 4))
    assert(viaIndex === direct)
    // every batch item found its planted source at offset +1
    val planted = viaIndex.filter(p => p._2 == p._1 - 1)
    assert(planted.size === 6)
    assert(planted.forall(_._3 == 1))
    assert(planted.forall(_._4 == 12L)) // 3F−6 tokens at F=6

    // compaction: read-equivalent
    Constellation.compactTokenIndex(spark, dir)
    assert(render(Constellation.matchAgainstIndex(
      batchTokens, dir, "audio_dft32_v1", minMatches = 4)) === direct)

    // UNMARKED replay: token rows are disjoint facts, so a re-landed
    // batch doubles its media's match counts — the documented failure
    Constellation.appendToTokenIndex(ct.where(col("media_id") % 4 === 2),
      dir, "audio_dft32_v1", doneMarker = None)
    val inflated = render(Constellation.matchAgainstIndex(
      batchTokens, dir, "audio_dft32_v1", minMatches = 4))
    val vsIdx2 = inflated.filter(p => p._2 % 4 == 2 && p._2 == p._1 - 1)
    assert(vsIdx2.nonEmpty && vsIdx2.forall(_._4 == 24L),
      s"replayed batch must double its counts: $vsIdx2")
  }

  test("persisted-stats hot-token filter ≡ recomputed countDistinct, " +
      "including a token driven hot ONLY across build+append batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tokidx_stats").toString
    // hand-built token relations: token 7 is carried by 2 media in the
    // build batch and 2 more in the append batch — hot (>3) only in
    // AGGREGATE, so a filter that consulted either batch's own counts
    // (or failed to sum the persisted stats) would keep it
    def toks(ids: Seq[Long], token: Long) =
      ids.flatMap(id => (0 to 4).map(t => (id, t, token)))
    val build = (toks(Seq(0L, 2L), 7L) ++ toks(Seq(0L, 2L), 11L))
      .toDF("media_id", "t", "token")
    val append = (toks(Seq(4L, 6L), 7L) ++ toks(Seq(4L), 13L))
      .toDF("media_id", "t", "token")
    Constellation.writeTokenIndex(build, dir, "test_v1")
    Constellation.appendToTokenIndex(append, dir, "test_v1", Some("s1"))
    // the batch shares hot token 7 (must be dropped index-side) and
    // rare token 11 (must match media 0 and 2 at offset 0)
    val batch = (toks(Seq(101L), 7L) ++ toks(Seq(101L), 11L))
      .toDF("media_id", "t", "token")
    val viaStats = render(Constellation.matchAgainstIndex(
      batch, dir, "test_v1", minMatches = 4, maxTokenFreq = 3L))
    val recomputed = render(Constellation.matchPairs(
      batch, Constellation.readTokenIndex(spark, dir),
      minMatches = 4, maxTokenFreq = 3L)
      .where(col("a_id") =!= col("b_id")))
    assert(viaStats === recomputed)
    // token 7 really was filtered: only the two token-11 matches remain
    assert(viaStats.map(p => (p._1, p._2)).toSet === Set((101L, 0L), (101L, 2L)))
    assert(viaStats.forall(_._4 == 5L))
    // and the persisted stats summed across batches
    val hot = Constellation.readTokenStats(spark, dir)
      .where(col("token") === 7L).head()
    assert(hot.getAs[Long]("n_media") === 4L)
    // compaction keeps stats read-equivalent
    Constellation.compactTokenIndex(spark, dir)
    assert(render(Constellation.matchAgainstIndex(
      batch, dir, "test_v1", minMatches = 4, maxTokenFreq = 3L)) === viaStats)
  }

  test("plan gate: match-time ingest scans the token table exactly once " +
      "— no corpus-wide frequency re-aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("tokidx_plan").toString
    Constellation.writeTokenIndex(corpusTokens, dir, "audio_dft32_v1")
    val out = Constellation.matchAgainstIndex(
      batchTokens, dir, "audio_dft32_v1", minMatches = 4)
    val tokenScans = out.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
      .count(s => s.contains("/tokens"))
    assert(tokenScans === 1,
      s"the persisted token table must be scanned exactly once at match " +
        s"time (the join); found $tokenScans scans:\n" +
        out.queryExecution.executedPlan)
  }

  test("a kind mismatch is refused loudly — geometries never silently mix") {
    val dir = java.nio.file.Files.createTempDirectory("tokidx_kind").toString
    Constellation.writeTokenIndex(corpusTokens, dir, "audio_dft32_v1")
    val e = intercept[IllegalArgumentException] {
      Constellation.matchAgainstIndex(batchTokens, dir, "video_dhash_pair")
    }
    assert(e.getMessage.contains("audio_dft32_v1"))
    val e2 = intercept[IllegalArgumentException] {
      Constellation.appendToTokenIndex(batchTokens, dir, "video_dhash_pair")
    }
    assert(e2.getMessage.contains("geometries"))
  }
}
