package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, HeavyHitters}
import graft.sources.Tables

/** Misra-Gries frequency sketch: the N/(capacity+1) guarantee must
  * hold under ANY partitioning/merge tree (mergeable-summaries
  * combine), and the reported counts must under-count by at most
  * N/(capacity+1). Also: the bloom-pruned contamination scan is
  * EXACTLY the unpruned scan, even with a deliberately awful fpp. */
class HeavyHittersSpec extends SparkTestBase {

  private def exactCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("guarantee holds across 1, 4, and 13 partitions on zipf-ish data") {
    import spark.implicits._
    val rnd = new Random(7)
    // zipf-ish: token id = floor(1/u) capped — few hot tokens, long tail
    val texts = (0 until 400).map { _ =>
      (0 until 50).map { _ =>
        val u = math.max(rnd.nextDouble(), 1e-4)
        s"tok${math.min((1.0 / u).toInt, 5000)}"
      }.mkString(" ")
    }
    val exact = exactCounts(texts)
    val n = exact.values.sum
    val capacity = 64
    for (parts <- Seq(1, 4, 13)) {
      val df = spark.createDataset(texts).repartition(parts).toDF("text")
      val mg = df.agg(HeavyHitters.heavyHitters(capacity)(col("text")))
        .collect()(0).getMap[String, Long](0).toMap
      assert(mg.size <= capacity, s"parts=$parts size=${mg.size}")
      val threshold = n.toDouble / (capacity + 1)
      for ((w, c) <- exact if c > threshold) {
        assert(mg.contains(w),
          s"parts=$parts: heavy token $w (cnt=$c > $threshold) missing")
        assert(mg(w) <= c, s"parts=$parts: $w over-counted: ${mg(w)} > $c")
        assert(c - mg(w) <= threshold + 1,
          s"parts=$parts: $w under-counted past the bound: ${mg(w)} vs $c")
      }
    }
  }

  test("degenerate inputs: empty corpus, null and blank texts") {
    import spark.implicits._
    val df = Seq(Some("a a b"), None, Some("   ")).toDF("text")
    val mg = df.agg(HeavyHitters.heavyHitters(8)(col("text")))
      .collect()(0).getMap[String, Long](0).toMap
    assert(mg === Map("a" -> 2L, "b" -> 1L))
    val empty = spark.emptyDataset[String].toDF("text")
      .agg(HeavyHitters.heavyHitters(8)(col("text")))
      .collect()(0).getMap[String, Long](0).toMap
    assert(empty.isEmpty)
  }

  test("below-capacity corpus is counted exactly") {
    import spark.implicits._
    val texts = Seq("x y z", "x y", "x")
    val df = spark.createDataset(texts).repartition(3).toDF("text")
    val mg = df.agg(HeavyHitters.heavyHitters(16)(col("text")))
      .collect()(0).getMap[String, Long](0).toMap
    assert(mg === Map("x" -> 3L, "y" -> 2L, "z" -> 1L))
  }

  // --- the at-rest deterministic summary (probe x126's machinery) ---

  private def summaryMap(path: String): Map[String, Long] =
    HeavyHitters.readSummary(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("at-rest: deterministic prune — ≤ capacity rows, guarantee intact, partition-invariant") {
    import spark.implicits._
    val rnd = new Random(11)
    val texts = (0 until 300).map { _ =>
      (0 until 40).map { _ =>
        val u = math.max(rnd.nextDouble(), 1e-4)
        s"tok${math.min((1.0 / u).toInt, 3000)}"
      }.mkString(" ")
    }
    val exact = exactCounts(texts)
    val n = exact.values.sum
    val capacity = 48
    val ref = HeavyHitters.summarize(
      spark.createDataset(texts).toDF("text"), col("text"), capacity)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ref.size <= capacity)
    val threshold = n.toDouble / (capacity + 1)
    for ((w, c) <- exact if c > threshold) {
      assert(ref.contains(w), s"heavy $w missing from the summary")
      assert(ref(w) <= c && c - ref(w) <= threshold + 1)
    }
    // order/partitioning-free: any repartition yields the SAME rows
    for (parts <- Seq(3, 17)) {
      val alt = HeavyHitters.summarize(
        spark.createDataset(rnd.shuffle(texts)).repartition(parts)
          .toDF("text"), col("text"), capacity)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(alt === ref, s"parts=$parts summary differs")
    }
  }

  test("at-rest: build+append keeps the guarantee over the UNION; replay marker load-bearing") {
    import spark.implicits._
    val a = (0 until 100).map(i => s"hot hot warm w$i")
    val b = (0 until 100).map(i => s"hot warm cool v$i")
    val dir = java.nio.file.Files.createTempDirectory("mg_rt").toString
    val capacity = 16
    HeavyHitters.writeSummary(a.toDF("text"), "text", dir, capacity)
    HeavyHitters.appendToSummary(b.toDF("text"), dir, Some("b1"))
    val merged = summaryMap(dir)
    assert(merged.size <= capacity)
    val exact = exactCounts(a ++ b)
    val n = exact.values.sum
    val threshold = n.toDouble / (capacity + 1)
    for ((w, c) <- exact if c > threshold) {
      assert(merged.contains(w), s"heavy $w lost across append")
      assert(merged(w) <= c, s"$w over-counted after merge")
      assert(c - merged(w) <= threshold + 1, s"$w past the merged bound")
    }
    // marked replay: no-op
    HeavyHitters.appendToSummary(b.toDF("text"), dir, Some("b1"))
    assert(summaryMap(dir) === merged)
    // compaction: read-equivalent, ≤ capacity persisted rows
    HeavyHitters.compactSummary(spark, dir)
    assert(spark.read.parquet(s"$dir/summaries").count() <= capacity.toLong)
    assert(summaryMap(dir) === merged)
    // UNMARKED replay: batch b's mass double-counts (sum-merge is not
    // idempotent) — 'hot' must strictly exceed its marked-replay value
    HeavyHitters.appendToSummary(b.toDF("text"), dir, None)
    assert(summaryMap(dir)("hot") > merged("hot"))
  }

  test("bloom-pruned contamination is exactly the unpruned scan, fpp 0.5") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val train = docs.where(col("doc_id") % 2 === 0)
    val eval = docs.where(col("doc_id") % 2 === 1)
    val base = Dedup.contamination(train, eval, n = 3, minOverlap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // fpp 0.5 floods the prefilter with false positives; the equi-join
    // must still reduce the result to the exact scan.
    val pruned = Dedup.contaminationBloomPruned(train, eval, n = 3,
        minOverlap = 3, fpp = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(base === pruned)
    assert(base.nonEmpty)
  }

  test("bloom prefilter actually prunes disjoint-corpus shingles") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // eval and train share NOTHING: the bloom should kill (almost) all
    // train shingle rows before the join.
    val train = (0L until 200L).map(i => (i, s"alpha$i beta$i gamma$i delta$i"))
      .toDF("doc_id", "text")
    val eval = Seq((1000L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val eh = Dedup.shingleHashSets(eval, 3).select(explode(col("sh_hashes")).as("h"))
    val bloom = eh.distinct().stat.bloomFilter("h", 16L, 0.01)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
    val th = Dedup.shingleHashSets(train, 3).select(explode(col("sh_hashes")).as("h"))
    val survivors = th.where(call_function("bloom_might_contain", lit(bytes), col("h"))).count()
    val totalRows = th.count()
    assert(totalRows === 400L) // 200 docs × 2 shingles
    assert(survivors <= totalRows / 10,
      s"bloom left $survivors of $totalRows disjoint shingles")
    assert(Dedup.contaminationBloomPruned(train, eval, 3, 3).count() === 0L)
  }
}
