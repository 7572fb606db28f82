package graft

import org.apache.spark.sql.functions._

import graft.operators.Manifest

/** The at-rest dataset-version manifest and diff (x141): exact per-id
  * added/removed/changed/unchanged statuses under pair-set semantics,
  * append ≡ rebuild, value-harmless replay, multi-variant ids,
  * incomparability refusal, compaction. */
class ManifestSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(ids: Seq[Long], suffix: String = "") =
    ids.map(i => (i, s"text of $i$suffix")).toDF("doc_id", "text")

  private def statuses(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("diff reports exact per-id statuses; diff() hides unchanged; " +
      "summary counts match") {
    val a = java.nio.file.Files.createTempDirectory("mf_a").toString
    val b = java.nio.file.Files.createTempDirectory("mf_b").toString
    Manifest.writeManifest(docs(1L to 10L), a, nBuckets = 4)
    // B: 1..8 kept (7,8 edited), 9,10 removed, 11,12 added
    val vB = docs(1L to 6L)
      .union(docs(Seq(7L, 8L), suffix = "_v2"))
      .union(docs(Seq(11L, 12L)))
    Manifest.writeManifest(vB, b, nBuckets = 4)
    val full = statuses(Manifest.diffManifests(spark, a, b))
    assert(full === Map(
      1L -> "unchanged", 2L -> "unchanged", 3L -> "unchanged",
      4L -> "unchanged", 5L -> "unchanged", 6L -> "unchanged",
      7L -> "changed", 8L -> "changed",
      9L -> "removed", 10L -> "removed",
      11L -> "added", 12L -> "added"))
    assert(statuses(Manifest.diff(spark, a, b)).keySet ===
      Set(7L, 8L, 9L, 10L, 11L, 12L))
    val sum = Manifest.diffSummary(spark, a, b).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum === Map("unchanged" -> 6L, "changed" -> 2L,
      "removed" -> 2L, "added" -> 2L))
  }

  test("append ≡ rebuild; marked replay lands nothing; an unmarked " +
      "replay is VALUE-harmless (pair dedup)") {
    val one = java.nio.file.Files.createTempDirectory("mf_one").toString
    val inc = java.nio.file.Files.createTempDirectory("mf_inc").toString
    val all = docs(1L to 100L)
    Manifest.writeManifest(all, one)
    Manifest.writeManifest(all.where($"doc_id" <= 50), inc)
    Manifest.appendToManifest(all.where($"doc_id" > 50), inc, Some("b1"))
    val pairs = (d: String) => Manifest.readManifest(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs(one) === pairs(inc))
    val rows0 = spark.read.parquet(s"$inc/rows").count()
    Manifest.appendToManifest(all.where($"doc_id" > 50), inc, Some("b1"))
    assert(spark.read.parquet(s"$inc/rows").count() === rows0,
      "marked replay is a row-level no-op")
    Manifest.appendToManifest(all.where($"doc_id" > 50), inc, None)
    assert(spark.read.parquet(s"$inc/rows").count() > rows0)
    assert(pairs(one) === pairs(inc),
      "unmarked replay rows collapse in the pair dedup")
  }

  test("multi-variant ids use pair-SET semantics: same sets read " +
      "unchanged, a lost variant reads changed") {
    val a = java.nio.file.Files.createTempDirectory("mf_mva").toString
    val b = java.nio.file.Files.createTempDirectory("mf_mvb").toString
    // id 1 carries two content variants in A
    val twoVar = Seq((1L, "v1"), (1L, "v2"), (2L, "solo")).toDF("doc_id", "text")
    Manifest.writeManifest(twoVar, a)
    Manifest.writeManifest(twoVar, b)
    assert(statuses(Manifest.diffManifests(spark, a, b)) ===
      Map(1L -> "unchanged", 2L -> "unchanged"))
    val c = java.nio.file.Files.createTempDirectory("mf_mvc").toString
    Manifest.writeManifest(
      Seq((1L, "v1"), (2L, "solo")).toDF("doc_id", "text"), c)
    assert(statuses(Manifest.diffManifests(spark, a, c)) ===
      Map(1L -> "changed", 2L -> "unchanged"),
      "losing one of an id's variants is a change, not a removal")
  }

  test("manifests with different id/content schemas are refused") {
    val a = java.nio.file.Files.createTempDirectory("mf_ra").toString
    val b = java.nio.file.Files.createTempDirectory("mf_rb").toString
    Manifest.writeManifest(docs(1L to 5L), a, contentCols = Seq("text"))
    Manifest.writeManifest(docs(1L to 5L).withColumn("extra", lit("x")),
      b, contentCols = Seq("text", "extra"))
    intercept[IllegalArgumentException] {
      Manifest.diffManifests(spark, a, b)
    }
  }

  test("compaction dedups to the pair set under the bucket layout, " +
      "read- and diff-equivalent, still appendable") {
    val a = java.nio.file.Files.createTempDirectory("mf_ca").toString
    val all = docs(1L to 60L)
    Manifest.writeManifest(all.where($"doc_id" <= 20), a, nBuckets = 4)
    Manifest.appendToManifest(
      all.where($"doc_id" > 20 && $"doc_id" <= 40), a, Some("c1"))
    Manifest.appendToManifest(all.where($"doc_id" > 40), a, Some("c2"))
    Manifest.appendToManifest(all.where($"doc_id" > 40), a, None) // dup rows
    val before = Manifest.readManifest(spark, a).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    Manifest.compactManifest(spark, a)
    assert(spark.read.parquet(s"$a/rows").count() === 60L,
      "compaction folds replayed rows to the distinct pair set")
    assert(Manifest.readManifest(spark, a).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq === before)
    Manifest.appendToManifest(docs(61L to 70L), a, Some("c3"))
    assert(Manifest.readManifest(spark, a).count() === 70L)
  }
}
