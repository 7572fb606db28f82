package graft

import org.apache.spark.sql.functions._

import graft.operators.Bm25
import graft.sources.Tables

/** The at-rest BM25 index: query ≡ the direct corpus-scan join,
  * append ≡ rebuild, replay markers, compaction, and the
  * partition-pruned query plan (the whole point — a retrieval call
  * must not re-scan the corpus OR the full postings table). */
class Bm25IndexSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  private val queries = Seq(
    (1L, Seq("spark", "vector")),
    (2L, Seq("customer", "zzz", "spark")),
    (3L, Seq("vector", "supplier", "region", "order"))).toDF("q_id", "terms")

  private def collectRanks(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "doc_id", "bm25", "n_hit", "rank")
      .as[(Long, Long, Double, Long, Int)].collect().toSeq.sorted

  test("topKJoinFromIndex equals the direct corpus-scan topKJoin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
    Bm25.writeIndex(docs, dir, nBuckets = 16)
    val direct = collectRanks(Bm25.topKJoin(docs, queries, k = 5))
    val indexed = collectRanks(Bm25.topKJoinFromIndex(queries, dir, k = 5))
    assert(indexed == direct, "index path diverged from the direct join")
  }

  test("append ≡ rebuild: postings, stats and query results all match") {
    val half1 = docs.where($"doc_id" % 2 === 0)
    val half2 = docs.where($"doc_id" % 2 === 1)
    val dirA = java.nio.file.Files.createTempDirectory("graft_bm25_app").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_bm25_all").toString
    Bm25.writeIndex(half1, dirA, nBuckets = 8)
    Bm25.appendToIndex(half2, dirA, doneMarker = Some("b1"))
    Bm25.writeIndex(docs, dirB, nBuckets = 8)
    // postings sets identical (a posting is a pure per-row function)
    val pa = spark.read.parquet(s"$dirA/postings")
      .select("doc_id", "dl", "word", "tf", "tb")
      .as[(Long, Long, String, Long, Int)].collect().toSeq.sorted
    val pb = spark.read.parquet(s"$dirB/postings")
      .select("doc_id", "dl", "word", "tf", "tb")
      .as[(Long, Long, String, Long, Int)].collect().toSeq.sorted
    assert(pa == pb, "appended postings != rebuild postings")
    // merged stats identical (exact long sums)
    val sa = spark.read.parquet(s"$dirA/stats")
      .agg(sum("n_docs"), sum("sum_dl")).as[(Long, Long)].head()
    val sb = spark.read.parquet(s"$dirB/stats")
      .agg(sum("n_docs"), sum("sum_dl")).as[(Long, Long)].head()
    assert(sa == sb, s"stats diverged: $sa vs $sb")
    // and therefore the query results
    assert(collectRanks(Bm25.topKJoinFromIndex(queries, dirA, k = 5)) ==
      collectRanks(Bm25.topKJoinFromIndex(queries, dirB, k = 5)))
  }

  test("append replays are no-ops once the done marker landed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_rp").toString
    Bm25.writeIndex(docs.where($"doc_id" < 100), dir, nBuckets = 8)
    val batch = docs.where($"doc_id" >= 100 && $"doc_id" < 150)
    Bm25.appendToIndex(batch, dir, doneMarker = Some("mb7"))
    val afterOnce = spark.read.parquet(s"$dir/postings").count()
    val statsOnce = spark.read.parquet(s"$dir/stats").count()
    Bm25.appendToIndex(batch, dir, doneMarker = Some("mb7")) // replay
    assert(spark.read.parquet(s"$dir/postings").count() == afterOnce,
      "replayed append duplicated postings")
    assert(spark.read.parquet(s"$dir/stats").count() == statsOnce,
      "replayed append duplicated a stats row")
  }

  test("append derives bucket geometry from the artifact, not the caller") {
    // writeIndex with 8 buckets, then append — the appended rows must
    // land in the SAME tb the 8-bucket hash assigns, or the pruned
    // query stops seeing them
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_geo").toString
    Bm25.writeIndex(docs.where($"doc_id" < 100), dir, nBuckets = 8)
    Bm25.appendToIndex(docs.where($"doc_id" >= 100 && $"doc_id" < 200), dir)
    val bad = spark.read.parquet(s"$dir/postings")
      .where(col("tb") =!= pmod(xxhash64(col("word")), lit(8L)).cast("int"))
      .count()
    assert(bad == 0, s"$bad postings landed in a foreign bucket")
  }

  test("query plan prunes to the query terms' buckets; no corpus scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_plan").toString
    Bm25.writeIndex(docs, dir, nBuckets = 16)
    val out = Bm25.topKJoinFromIndex(queries, dir, k = 5)
    val plan = out.queryExecution.executedPlan.toString
    // the corpus (raw text) is nowhere in the query-time plan
    assert(!plan.contains("documents.parquet"),
      "query-time plan reads the raw corpus")
    // the postings scan carries tb as a PARTITION filter (pruning at
    // file listing, not a post-scan filter)
    assert(plan.contains("PartitionFilters") && plan.contains("tb#"),
      s"no partition filter on the postings scan:\n$plan")
    // and the listing actually pruned: ≤ |vocab| of 16 directories.
    // 8 distinct terms can hash to at most 8 buckets.
    val scanned = out.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
      .filter(s => s.contains("postings"))
    assert(scanned.nonEmpty, "no postings scan found")
  }

  test("compaction preserves query results and collapses bucket files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_cmp").toString
    Bm25.writeIndex(docs.where($"doc_id" < 200), dir, nBuckets = 8)
    Bm25.appendToIndex(docs.where($"doc_id" >= 200 && $"doc_id" < 300), dir,
      doneMarker = Some("c1"))
    Bm25.appendToIndex(docs.where($"doc_id" >= 300), dir,
      doneMarker = Some("c2"))
    val before = collectRanks(Bm25.topKJoinFromIndex(queries, dir, k = 5))
    Bm25.compactIndex(spark, dir)
    assert(collectRanks(Bm25.topKJoinFromIndex(queries, dir, k = 5)) == before,
      "compaction changed query results")
    // one data file per bucket directory after the rewrite
    val root = new java.io.File(s"$dir/postings")
    val perBucket = root.listFiles().filter(_.getName.startsWith("tb="))
      .map(d => d.listFiles().count(f => f.getName.endsWith(".parquet")))
    assert(perBucket.nonEmpty && perBucket.forall(_ == 1),
      s"bucket file counts after compaction: ${perBucket.mkString(",")}")
    // replay markers survived the swap
    assert(new java.io.File(s"$dir/_append_c1_ok").exists(),
      "compaction dropped the append replay marker")
  }
}
