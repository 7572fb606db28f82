package graft

import org.apache.spark.sql.functions._

import graft.operators.{BottomKSample, StratifiedSample}

/** The at-rest stratified bottom-k sample (x137): per-stratum exact
  * merge identity (append ≡ rebuild), partitioning independence,
  * value-harmless replay, pruned per-stratum reads, compaction, salt
  * independence from the uniform sample, and the bounded-heap plan
  * shape (no window over input rows). */
class StratifiedSampleSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(ids: Range) =
    ids.map(i => (i.toLong, s"lang${i % 3}", s"src${i % 5}"))
      .toDF("doc_id", "lang", "src")

  private def render(df: org.apache.spark.sql.DataFrame) =
    df.select("lang", "skey", "doc_id", "src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(t => (t._1, t._2, t._3)).toSeq

  test("append ≡ rebuild per stratum; independent of arrival order " +
      "and partitioning") {
    val dirA = java.nio.file.Files.createTempDirectory("sts_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("sts_b").toString
    val all = docs(0 until 900)
    StratifiedSample.writeSample(all, dirA, k = 20, strataCol = "lang",
      payloadCols = Seq("src"))
    StratifiedSample.writeSample(all.where($"doc_id" % 3 === 1), dirB,
      k = 20, strataCol = "lang", payloadCols = Seq("src"))
    StratifiedSample.appendToSample(
      all.where($"doc_id" % 3 === 2).repartition(7, $"src"), dirB, Some("m0"))
    StratifiedSample.appendToSample(all.where($"doc_id" % 3 === 0), dirB,
      Some("m1"))
    val a = render(StratifiedSample.readSample(spark, dirA))
    assert(a === render(StratifiedSample.readSample(spark, dirB)))
    assert(a.size === 60, "k rows per stratum, 3 strata")
    assert(a.groupBy(_._1).view.mapValues(_.size).toMap ===
      Map("lang0" -> 20, "lang1" -> 20, "lang2" -> 20))
    // each stratum's members are the true bottom-k of that stratum
    val direct = all
      .select($"lang", StratifiedSample.sampleKey($"doc_id").as("skey"),
        $"doc_id", $"src")
    val want = direct.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (t._2, t._3)).take(20)
      }.sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(a === want)
  }

  test("replay is VALUE-harmless (min-k ignores multiplicity) and a " +
      "drifted payload cannot hold two slots") {
    val dir = java.nio.file.Files.createTempDirectory("sts_rep").toString
    val all = docs(0 until 600)
    StratifiedSample.writeSample(all, dir, k = 15, strataCol = "lang",
      payloadCols = Seq("src"))
    val before = render(StratifiedSample.readSample(spark, dir))
    // unmarked replay with mutated payloads — rows land again
    StratifiedSample.appendToSample(
      all.withColumn("src", concat(lit("drift_"), $"src")), dir, None)
    val after = StratifiedSample.readSample(spark, dir)
    val ids = after.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ids.size === 45 && ids.distinct.size === 45)
    assert(ids.sorted === before.map(t => (t._1, t._3)).sorted,
      "membership is a function of (stratum, id) alone")
    // marked replay lands nothing
    val rows0 = spark.read.parquet(s"$dir/rows").count()
    StratifiedSample.appendToSample(all, dir, Some("r1"))
    StratifiedSample.appendToSample(all, dir, Some("r1"))
    assert(spark.read.parquet(s"$dir/rows").count() > rows0,
      "first marked append lands")
    val rows1 = spark.read.parquet(s"$dir/rows").count()
    StratifiedSample.appendToSample(all, dir, Some("r1"))
    assert(spark.read.parquet(s"$dir/rows").count() === rows1,
      "marked replay is a row-level no-op")
  }

  test("readStratum returns one stratum's sample through a partition-" +
      "pruned scan") {
    val dir = java.nio.file.Files.createTempDirectory("sts_ps").toString
    StratifiedSample.writeSample(docs(0 until 600), dir, k = 10,
      strataCol = "lang", payloadCols = Seq("src"))
    val one = StratifiedSample.readStratum(spark, dir, "lang1")
    assert(render(one) ===
      render(StratifiedSample.readSample(spark, dir)).filter(_._1 == "lang1"))
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang#"),
      s"the stratum must travel as a partition filter:\n$plan")
  }

  test("compaction folds to ≤ strata·k rows, read-equivalent, " +
      "still appendable") {
    val dir = java.nio.file.Files.createTempDirectory("sts_cmp").toString
    val all = docs(0 until 800)
    StratifiedSample.writeSample(all.where($"doc_id" < 300), dir, k = 12,
      strataCol = "lang", payloadCols = Seq("src"))
    StratifiedSample.appendToSample(
      all.where($"doc_id" >= 300 && $"doc_id" < 600), dir, Some("c1"))
    StratifiedSample.appendToSample(all.where($"doc_id" >= 600), dir,
      Some("c2"))
    val before = render(StratifiedSample.readSample(spark, dir))
    StratifiedSample.compactSample(spark, dir)
    assert(spark.read.parquet(s"$dir/rows").count() <= 36L)
    assert(render(StratifiedSample.readSample(spark, dir)) === before)
    StratifiedSample.appendToSample(docs(800 until 900), dir, Some("c3"))
    assert(render(StratifiedSample.readSample(spark, dir)).size === 36)
  }

  test("salted independently of the uniform sample: stratum membership " +
      "does not correlate with x132 membership") {
    val ids = (0L until 200L)
    val both = ids.map(i => (i, i)).toDF("a", "b")
      .select(StratifiedSample.sampleKey($"a").as("s"),
        BottomKSample.sampleKey($"b").as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(both.forall { case (s, u) => s != u },
      "different salts must produce different key streams")
    // rank correlation is near zero: the doc with the smallest
    // stratified key is not systematically small in the uniform order
    val sRank = both.map(_._1).sorted.zipWithIndex.toMap
    val uRank = both.map(_._2).sorted.zipWithIndex.toMap
    val n = both.length
    val sumD2 = both.map { case (s, u) =>
      val d = sRank(s).toDouble - uRank(u).toDouble; d * d
    }.sum
    val spearman = 1.0 - 6.0 * sumD2 / (n.toDouble * (n * n - 1.0))
    assert(math.abs(spearman) < 0.2,
      s"sample keys must be rank-independent, got spearman=$spearman")
  }

  test("plan shape: build is a partial-aggregable bounded heap — " +
      "ObjectHashAggregate, no Window, no Sort over input rows") {
    val build = StratifiedSample.bottomKPerStratum(docs(0 until 500),
      k = 10, idCol = "doc_id", strataCol = "lang",
      payloadCols = Seq("src"))
    val plan = build.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the top_k_struct heap:\n$plan")
    assert(!plan.contains("Window"), s"no window:\n$plan")
    assert(plan.contains("partial_topkstruct"),
      s"the heap must partial-aggregate map-side:\n$plan")
  }
}
