package graft

import org.apache.spark.sql.functions._

import graft.operators.Rollup

/** The at-rest exact keyed rollup (x136): per-column merge semantics
  * (n/sum SUM-merged and marker-guarded, min/max idempotent),
  * append ≡ rebuild, partition-pruned lookups, bounded-key refusal,
  * compaction, and the partial-aggregation plan shape. */
class RollupSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(ids: Range) =
    ids.map(i => (i.toLong, s"lang${i % 4}", (i % 97).toLong))
      .toDF("doc_id", "lang", "len")

  private def render(df: org.apache.spark.sql.DataFrame) =
    df.select("lang", "n", "sum_v", "min_v", "max_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  test("build + appends ≡ one-shot rebuild, exactly") {
    val dirA = java.nio.file.Files.createTempDirectory("ro_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("ro_b").toString
    val all = docs(0 until 900)
    Rollup.writeRollup(all, dirA, Seq("lang"), "len", nBuckets = 8)
    Rollup.writeRollup(all.where($"doc_id" < 300), dirB, Seq("lang"), "len",
      nBuckets = 8)
    Rollup.appendToRollup(all.where($"doc_id" >= 300 && $"doc_id" < 600),
      dirB, Some("m1"))
    Rollup.appendToRollup(all.where($"doc_id" >= 600), dirB, Some("m2"))
    assert(render(Rollup.readRollup(spark, dirA)) ===
      render(Rollup.readRollup(spark, dirB)))
    // and both equal the direct corpus aggregate
    val direct = all.groupBy("lang").agg(count(lit(1)).as("n"),
      sum("len").as("sum_v"), min("len").as("min_v"),
      max("len").as("max_v"))
    assert(render(Rollup.readRollup(spark, dirB)) === render(direct))
  }

  test("replay semantics PER COLUMN: marked replay is a full no-op; an " +
      "unmarked replay double-counts n/sum while min/max hold") {
    val dir = java.nio.file.Files.createTempDirectory("ro_rep").toString
    val all = docs(0 until 400)
    Rollup.writeRollup(all.where($"doc_id" < 200), dir, Seq("lang"), "len")
    Rollup.appendToRollup(all.where($"doc_id" >= 200), dir, Some("b1"))
    val before = render(Rollup.readRollup(spark, dir))
    Rollup.appendToRollup(all.where($"doc_id" >= 200), dir, Some("b1"))
    assert(render(Rollup.readRollup(spark, dir)) === before,
      "marked replay must be a no-op")
    // UNMARKED replay: the SUM-merged columns shift (the documented
    // failure mode — the marker is load-bearing), the idempotent
    // min/max columns do not
    Rollup.appendToRollup(all.where($"doc_id" >= 200), dir, None)
    val after = render(Rollup.readRollup(spark, dir))
    val halfN = all.where($"doc_id" >= 200)
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("len").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    before.zip(after).foreach { case ((lang, n0, s0, mn0, mx0),
                                      (lang1, n1, s1, mn1, mx1)) =>
      assert(lang === lang1)
      assert(n1 === n0 + halfN(lang)._1, s"$lang n must double-count")
      assert(s1 === s0 + halfN(lang)._2, s"$lang sum must double-count")
      assert(mn1 === mn0 && mx1 === mx0,
        s"$lang min/max merge idempotently — replay is value-harmless there")
    }
  }

  test("lookup returns exactly the queried keys' merged rows and " +
      "partition-prunes on kb") {
    val dir = java.nio.file.Files.createTempDirectory("ro_lk").toString
    val all = docs(0 until 800)
    Rollup.writeRollup(all.where($"doc_id" < 400), dir, Seq("lang"), "len",
      nBuckets = 16)
    Rollup.appendToRollup(all.where($"doc_id" >= 400), dir, Some("l1"))
    val q = Seq("lang1", "lang3", "never_seen").toDF("lang")
    val got = Rollup.lookup(spark, dir, q)
    val expect = render(Rollup.readRollup(spark, dir)
      .where($"lang".isin("lang1", "lang3")))
    assert(render(got) === expect)
    assert(got.where($"lang" === "never_seen").count() === 0L,
      "a key never ingested returns no row")
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("kb#"),
      s"lookup must prune on the kb partition, got:\n$plan")
  }

  test("lookup refuses an unbounded key relation and a wrong-keyed one") {
    val dir = java.nio.file.Files.createTempDirectory("ro_ref").toString
    Rollup.writeRollup(docs(0 until 50), dir, Seq("lang"), "len")
    intercept[IllegalArgumentException] {
      Rollup.lookup(spark, dir, Seq(1).toDF("not_the_key"))
    }
    val wide = (0 until Rollup.maxLookupKeys + 10)
      .map(i => s"k$i").toDF("lang")
    intercept[IllegalArgumentException] {
      Rollup.lookup(spark, dir, wide)
    }
  }

  test("compaction folds per-batch rows to one per key, read- and " +
      "lookup-equivalent, and stays appendable") {
    val dir = java.nio.file.Files.createTempDirectory("ro_cmp").toString
    val all = docs(0 until 600)
    Rollup.writeRollup(all.where($"doc_id" < 200), dir, Seq("lang"), "len",
      nBuckets = 4)
    Rollup.appendToRollup(all.where($"doc_id" >= 200 && $"doc_id" < 400),
      dir, Some("c1"))
    Rollup.appendToRollup(all.where($"doc_id" >= 400), dir, Some("c2"))
    val before = render(Rollup.readRollup(spark, dir))
    Rollup.compactRollup(spark, dir)
    assert(spark.read.parquet(s"$dir/rows").count() === 4L,
      "after compaction: one row per key")
    assert(render(Rollup.readRollup(spark, dir)) === before)
    val lk = Rollup.lookup(spark, dir, Seq("lang2").toDF("lang"))
    assert(render(lk) === before.filter(_._1 == "lang2"))
    Rollup.appendToRollup(docs(600 until 700), dir, Some("c3"))
    assert(Rollup.readRollup(spark, dir).agg(sum("n")).head().getLong(0)
      === 700L)
  }

  test("retraction: n/sum are an exact inverse (≡ rebuild-without); " +
      "min/max degrade to conservative bounds; a fully-retracted key " +
      "vanishes; replayed retraction is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("ro_rtr").toString
    val all = docs(0 until 400)
    val keep = all.where($"doc_id" % 2 === 0)
    val bad = all.where($"doc_id" % 2 === 1)
    Rollup.writeRollup(keep, dir, Seq("lang"), "len", nBuckets = 8)
    Rollup.appendToRollup(bad, dir, Some("b1"))
    Rollup.retractFromRollup(bad, dir, Some("rt1"))
    val got = render(Rollup.readRollup(spark, dir))
    val want = render(keep.groupBy("lang").agg(count(lit(1)).as("n"),
      sum("len").as("sum_v"), min("len").as("min_v"),
      max("len").as("max_v")))
    // n and sum are exactly the rebuild-without values
    assert(got.map(t => (t._1, t._2, t._3)) ===
      want.map(t => (t._1, t._2, t._3)))
    // min/max are conservative BOUNDS on the remaining corpus (the
    // artifact cannot unsee the retracted batch's extremes)
    got.zip(want).foreach { case ((l, _, _, mn, mx), (l2, _, _, wmn, wmx)) =>
      assert(l === l2)
      assert(mn <= wmn && mx >= wmx,
        s"$l: persisted [$mn,$mx] must bound the true [$wmn,$wmx]")
    }
    // replayed retraction: gated no-op
    Rollup.retractFromRollup(bad, dir, Some("rt1"))
    assert(render(Rollup.readRollup(spark, dir)) === got)
    // a key whose every ingest was retracted vanishes entirely
    val dir2 = java.nio.file.Files.createTempDirectory("ro_rtr2").toString
    Rollup.writeRollup(keep, dir2, Seq("lang"), "len")
    val solo = docs(1000 until 1010)
      .withColumn("lang", lit("lang_gone"))
    Rollup.appendToRollup(solo, dir2, Some("s1"))
    Rollup.retractFromRollup(solo, dir2, Some("rts1"))
    assert(Rollup.readRollup(spark, dir2)
      .where($"lang" === "lang_gone").count() === 0L,
      "a fully-retracted key must read as never ingested")
    assert(Rollup.lookup(spark, dir2, Seq("lang_gone").toDF("lang"))
      .count() === 0L)
  }

  test("composite keys bucket and merge correctly") {
    val dir = java.nio.file.Files.createTempDirectory("ro_ck").toString
    val all = docs(0 until 300).withColumn("src",
      concat(lit("s"), ($"doc_id" % 3).cast("string")))
    Rollup.writeRollup(all.where($"doc_id" < 150), dir,
      Seq("lang", "src"), "len", nBuckets = 8)
    Rollup.appendToRollup(all.where($"doc_id" >= 150), dir, Some("k1"))
    val got = Rollup.readRollup(spark, dir)
    val direct = all.groupBy("lang", "src").agg(count(lit(1)).as("n"),
      sum("len").as("sum_v"), min("len").as("min_v"), max("len").as("max_v"))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("lang", "src", "n", "sum_v", "min_v", "max_v").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(key(got) === key(direct))
    // composite lookup prunes too
    val q = Seq(("lang0", "s0"), ("lang2", "s2")).toDF("lang", "src")
    assert(key(Rollup.lookup(spark, dir, q)) ===
      key(direct.where(($"lang" === "lang0" && $"src" === "s0") ||
        ($"lang" === "lang2" && $"src" === "s2"))))
  }

  test("plan shape: build/append aggregate partially (map-side combine), " +
      "no window, no sort over input rows") {
    val plan = Rollup.rollup(docs(0 until 500), Seq("lang"), "len")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected hash agg:\n$plan")
    assert(!plan.contains("Window"), s"no window in a rollup:\n$plan")
    assert(plan.contains("partial"),
      s"the grouped pass must partial-aggregate before the shuffle:\n$plan")
  }
}
