package graft

import org.apache.spark.sql.functions._

import graft.operators.{IndexStats, PqIndex, Similarity}
import graft.sources.Tables

/** The centroid-refresh policy for the append-mode indexes: appends
  * assign against PERSISTED centroids (the versioned-quantizer
  * contract), so after heavy drifted ingest cell balance and recall
  * degrade silently. IndexStats closes the gap with bounded per-cell
  * stats written at build/append time and a staleness readout that
  * never re-reads the codes. The signal must FIRE on drifted appends
  * and stay QUIET on stationary ones — the operational "when to
  * re-version" answer.
  */
class IndexStalenessSpec extends SparkTestBase {

  private def evenHalf = Tables.embeddings(spark, sfDir)
    .where(col("vec_id") % 2 === 0)
  private def oddHalf = Tables.embeddings(spark, sfDir)
    .where(col("vec_id") % 2 =!= 0)
  /** The odd half pushed far off the build distribution: every
    * component shifted by +10 (embeddings are ~unit-scale), so the
    * appended vectors sit far from every build-time centroid. */
  private def driftedOdd = oddHalf.withColumn("embedding",
    transform(col("embedding"), x => x + lit(10.0f)))

  test("int8 index: stationary append stays quiet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stale_q").toString
    Similarity.writeInt8Index(evenHalf, dir, nlist = 8)
    Similarity.appendToInt8Index(oddHalf, dir)
    val s = IndexStats.staleness(spark, dir)
    assert(s.nBuild > 0 && s.nAppended > 0)
    assert(s.appendShare > 0.3 && s.appendShare < 0.7)
    assert(!s.stale,
      s"stationary ingest must not trip the rebuild trigger: $s")
    assert(s.appendDistRatio < 1.5,
      s"same-distribution appends should sit near the build baseline: $s")
    assert(s.skewRatio < 2.0, s"balance should hold under stationary ingest: $s")
  }

  test("int8 index: drifted append fires the rebuild trigger") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stale_d").toString
    Similarity.writeInt8Index(evenHalf, dir, nlist = 8)
    Similarity.appendToInt8Index(driftedOdd, dir)
    val s = IndexStats.staleness(spark, dir)
    assert(s.stale, s"drifted ingest must trip the rebuild trigger: $s")
    assert(s.appendDistRatio > 1.5,
      s"drifted vectors must sit measurably farther from the persisted " +
        s"centroids than the build corpus did: $s")
  }

  test("staleness accumulates across appends; tiny drift stays sub-threshold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stale_m").toString
    Similarity.writeInt8Index(evenHalf, dir, nlist = 8)
    // a tiny drifted batch (below minAppendShare) must NOT fire alone
    Similarity.appendToInt8Index(driftedOdd.limit(3), dir,
      doneMarker = Some("m1"))
    val tiny = IndexStats.staleness(spark, dir)
    assert(tiny.appendShare < 0.05 && !tiny.stale,
      s"a sub-share drifted trickle must not trigger a rebuild: $tiny")
    // the full drifted load accumulates on top and fires
    Similarity.appendToInt8Index(driftedOdd, dir, doneMarker = Some("m2"))
    assert(IndexStats.staleness(spark, dir).stale)
    // marker-gated replay must not double-count the stats either
    val before = IndexStats.staleness(spark, dir).nAppended
    Similarity.appendToInt8Index(driftedOdd, dir, doneMarker = Some("m2"))
    assert(IndexStats.staleness(spark, dir).nAppended === before,
      "a marker-gated replay must be a stats no-op too")
  }

  test("ivf-pq index: stats ride build and append; stationary stays quiet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stale_pq").toString
    val dim = Tables.embeddings(spark, sfDir)
      .select(size(col("embedding"))).head().getInt(0)
    PqIndex.writeIndex(evenHalf, dir, nlist = 8, m = 4, ksub = 8, dim = dim)
    PqIndex.appendToIndex(oddHalf, dir)
    val quiet = IndexStats.staleness(spark, dir)
    assert(quiet.nBuild > 0 && quiet.nAppended > 0 && !quiet.stale)
    PqIndex.appendToIndex(driftedOdd.withColumn("vec_id",
      col("vec_id") + lit(1000000L)), dir)
    assert(IndexStats.staleness(spark, dir).stale,
      "PQ path must surface drifted ingest the same way")
  }

  test("an index without a build baseline fails loudly, not quietly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stale_n").toString
    assertThrows[Exception](IndexStats.staleness(spark, dir))
  }
}
