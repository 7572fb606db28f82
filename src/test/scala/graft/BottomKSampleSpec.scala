package graft

import org.apache.spark.sql.functions._

import graft.operators.BottomKSample

/** The at-rest bottom-k-by-hash uniform sample: exact merge identity
  * (append ≡ rebuild), order/partitioning independence, the family's
  * IDEMPOTENT replay contrast (min-k ignores multiplicity), bounded
  * compaction, and the TakeOrdered plan shape. */
class BottomKSampleSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(ids: Range) =
    ids.map(i => (i.toLong, s"lang${i % 3}")).toDF("doc_id", "lang")

  private def render(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("skey"), r.getAs[Long]("doc_id"),
      r.getAs[String]("lang"))).sortBy(t => (t._1, t._2)).toSeq

  test("append ≡ rebuild exactly; sample independent of arrival order") {
    val dirA = java.nio.file.Files.createTempDirectory("bks_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("bks_b").toString
    val all = docs(0 until 1000)
    // A: built in one shot; B: built from thirds in a different order
    BottomKSample.writeSample(all, dirA, k = 50, payloadCols = Seq("lang"))
    BottomKSample.writeSample(all.where($"doc_id" % 3 === 2), dirB, k = 50,
      payloadCols = Seq("lang"))
    BottomKSample.appendToSample(all.where($"doc_id" % 3 === 0), dirB,
      Some("m0"))
    BottomKSample.appendToSample(all.where($"doc_id" % 3 === 1), dirB,
      Some("m1"))
    val a = render(BottomKSample.readSample(spark, dirA))
    val b = render(BottomKSample.readSample(spark, dirB))
    assert(a === b, "bottomK(A∪B∪C) must equal merged per-batch bottom-k")
    assert(a.size === 50)
    // and a repartitioned rebuild lands the identical sample
    val dirC = java.nio.file.Files.createTempDirectory("bks_c").toString
    BottomKSample.writeSample(all.repartition(7, $"lang"), dirC, k = 50,
      payloadCols = Seq("lang"))
    assert(render(BottomKSample.readSample(spark, dirC)) === a)
  }

  test("replay is VALUE-harmless even unmarked (the idempotent contrast), " +
      "and the marker still bounds row count") {
    val dir = java.nio.file.Files.createTempDirectory("bks_rep").toString
    val all = docs(0 until 400)
    BottomKSample.writeSample(all.where($"doc_id" < 200), dir, k = 30,
      payloadCols = Seq("lang"))
    BottomKSample.appendToSample(all.where($"doc_id" >= 200), dir, Some("b1"))
    val before = render(BottomKSample.readSample(spark, dir))
    val rowsBefore = spark.read.parquet(s"$dir/rows").count()
    // marked replay: gated, nothing lands
    BottomKSample.appendToSample(all.where($"doc_id" >= 200), dir, Some("b1"))
    assert(spark.read.parquet(s"$dir/rows").count() === rowsBefore)
    // UNMARKED replay: rows land again, but the VALUE holds — min-k of
    // a deduplicated set ignores multiplicity (unlike the SUM-merged
    // sketches, where this exact scenario double-counts)
    BottomKSample.appendToSample(all.where($"doc_id" >= 200), dir, None)
    assert(spark.read.parquet(s"$dir/rows").count() > rowsBefore)
    assert(render(BottomKSample.readSample(spark, dir)) === before)
  }

  test("compaction shrinks to ≤ k rows and is read-equivalent") {
    val dir = java.nio.file.Files.createTempDirectory("bks_cmp").toString
    BottomKSample.writeSample(docs(0 until 300), dir, k = 25,
      payloadCols = Seq("lang"))
    (0 until 4).foreach(i => BottomKSample.appendToSample(
      docs(300 + i * 100 until 400 + i * 100), dir, Some(s"c$i")))
    val before = render(BottomKSample.readSample(spark, dir))
    BottomKSample.compactSample(spark, dir)
    assert(spark.read.parquet(s"$dir/rows").count() <= 25L)
    assert(render(BottomKSample.readSample(spark, dir)) === before)
    // still appendable after compaction
    BottomKSample.appendToSample(docs(700 until 800), dir, Some("c9"))
    assert(render(BottomKSample.readSample(spark, dir)).size === 25)
  }

  test("a sub-k corpus returns every row; the sample is the true bottom-k") {
    val dir = java.nio.file.Files.createTempDirectory("bks_small").toString
    BottomKSample.writeSample(docs(0 until 10), dir, k = 50,
      payloadCols = Seq("lang"))
    val got = render(BottomKSample.readSample(spark, dir))
    assert(got.size === 10)
    // true bottom-k: keys ascend and match a direct computation
    val direct = docs(0 until 10)
      .select(BottomKSample.sampleKey(col("doc_id")).as("skey"),
        col("doc_id"), col("lang"))
    assert(got === render(direct))
  }

  test("payload drift across replays: an id holds exactly ONE of the k " +
      "slots (dedup is by sample identity, not the full row)") {
    val dir = java.nio.file.Files.createTempDirectory("bks_drift").toString
    val all = docs(0 until 400)
    BottomKSample.writeSample(all, dir, k = 30, payloadCols = Seq("lang"))
    val before = render(BottomKSample.readSample(spark, dir))
    // unmarked replay of the whole corpus with MUTATED payloads — the
    // upstream-drift scenario: same ids, different lang values
    BottomKSample.appendToSample(
      all.withColumn("lang", concat(lit("drift_"), col("lang"))), dir, None)
    val after = BottomKSample.readSample(spark, dir)
    val ids = after.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.size === 30, "the sample must stay exactly k rows")
    assert(ids.distinct.size === 30,
      "a drifted id must not consume two slots and displace a member")
    assert(ids.sorted === before.map(_._2).sorted,
      "membership is a function of the id alone — drift cannot change it")
  }

  test("plan shape: the read is a bounded TakeOrdered, never a full sort") {
    val dir = java.nio.file.Files.createTempDirectory("bks_plan").toString
    BottomKSample.writeSample(docs(0 until 500), dir, k = 20,
      payloadCols = Seq("lang"))
    val plan = BottomKSample.readSample(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a bounded heap take, got:\n$plan")
    val build = BottomKSample.bottomK(docs(0 until 500), 20, "doc_id",
      Seq("lang")).queryExecution.executedPlan.toString
    assert(build.contains("TakeOrderedAndProject"),
      s"expected a bounded heap take in the build, got:\n$build")
  }
}
