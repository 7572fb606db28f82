package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Compaction, CorpusArtifact, Dedup, PqIndex, Similarity}
import graft.sources.Tables

/** Small-file compaction for the append-mode at-rest artifacts:
  * value-preserving (queries bit-identical before/after), layout-
  * preserving (partition pruning / bucketed joins survive), file
  * counts actually drop, metadata (markers, nshards, table props)
  * carried across the swap, and the interrupted-compaction leftover
  * refuses loudly instead of guessing. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  /** Non-hidden data files under dir, recursively. */
  private def dataFiles(dir: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .filter { p =>
        val n = p.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      }.toSeq
  }

  private def filesPerDir(dir: String): Map[String, Int] =
    dataFiles(dir).groupBy(_.getParent.toString).map { case (d, fs) => d -> fs.size }

  test("int8 index: compaction leaves queries bit-identical, one file per cell, " +
      "markers and stats untouched") {
    val embs = Tables.embeddings(spark, sfDir)
    val dir = Files.createTempDirectory("graft_cmp_i8").toString
    Similarity.writeInt8Index(embs.where(col("vec_id") % 3 === 0), dir, nlist = 4)
    Similarity.appendToInt8Index(embs.where(col("vec_id") % 3 === 1), dir,
      doneMarker = Some("b1"))
    Similarity.appendToInt8Index(embs.where(col("vec_id") % 3 === 2), dir,
      doneMarker = Some("b2"))
    val q = embs.where(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val before = Similarity.topKInt8FromIndex(spark, dir, q, k = 10, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val codesBefore = spark.read.parquet(s"$dir/codes")
      .collect().map(_.toString).sorted
    val statsBefore = spark.read.parquet(s"$dir/stats")
      .collect().map(_.toString).sorted
    assert(filesPerDir(s"$dir/codes").values.exists(_ >= 2),
      "fixture must have multi-file cells for the test to mean anything")

    Similarity.compactInt8Index(spark, dir)

    val after = Similarity.topKInt8FromIndex(spark, dir, q, k = 10, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after === before, "compaction changed query results")
    assert(spark.read.parquet(s"$dir/codes").collect().map(_.toString).sorted
      === codesBefore, "compaction changed the codes rows")
    assert(filesPerDir(s"$dir/codes").values.forall(_ == 1),
      s"expected one file per cell dir: ${filesPerDir(s"$dir/codes")}")
    // the nprobe partition filter still prunes at file level
    val plan = Similarity.topKInt8FromIndex(spark, dir, q, k = 10, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"partition pruning lost after compaction:\n$plan")
    // staleness baseline/batch stats are not an ingest concern of
    // compaction — byte-for-byte untouched
    assert(spark.read.parquet(s"$dir/stats").collect().map(_.toString).sorted
      === statsBefore)
    // replay markers carried across the swap: a replayed append after
    // compaction is still a no-op
    val n = spark.read.parquet(s"$dir/codes").count()
    Similarity.appendToInt8Index(embs.where(col("vec_id") % 3 === 1), dir,
      doneMarker = Some("b1"))
    assert(spark.read.parquet(s"$dir/codes").count() == n,
      "marker lost in compaction — replayed batch duplicated")
  }

  test("pq index: compaction preserves topKFromIndex exactly and shrinks both tables") {
    val embs = Tables.embeddings(spark, sfDir)
    val dir = Files.createTempDirectory("graft_cmp_pq").toString
    PqIndex.writeIndex(embs.where(col("vec_id") % 2 === 0), dir,
      nlist = 4, m = 4, ksub = 8, dim = 64)
    PqIndex.appendToIndex(embs.where(col("vec_id") % 2 === 1), dir)
    val q = embs.where(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val before = PqIndex.topKFromIndex(spark, dir, q, k = 10, nprobe = 3,
        shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val nFilesBefore = dataFiles(s"$dir/codes").size + dataFiles(s"$dir/vectors").size

    PqIndex.compactIndex(spark, dir)

    val after = PqIndex.topKFromIndex(spark, dir, q, k = 10, nprobe = 3,
        shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after === before, "compaction changed PQ query results")
    val nFilesAfter = dataFiles(s"$dir/codes").size + dataFiles(s"$dir/vectors").size
    assert(nFilesAfter < nFilesBefore,
      s"file count did not drop: $nFilesBefore -> $nFilesAfter")
    assert(filesPerDir(s"$dir/codes").values.forall(_ == 1))
    assert(filesPerDir(s"$dir/vectors").values.forall(_ == 1))
  }

  test("corpus artifact: compaction preserves rows, pruning, nshards, and markers") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), (col("doc_id") % 7 =!= 0).as("keep"))
    val dir = Files.createTempDirectory("graft_cmp_ca").toString + "/art"
    val table = "graft_spec_cmp_art"
    try {
      CorpusArtifact.write(docs.where(col("doc_id") % 2 === 0), dir, table,
        nShards = 4)
      CorpusArtifact.append(docs.where(col("doc_id") % 2 === 1), dir, table,
        doneMarker = Some("m1"))
      val before = spark.table(table)
        .collect().map(_.toString).sorted
      assert(filesPerDir(dir).values.exists(_ >= 2))

      CorpusArtifact.compact(spark, dir, table)

      assert(spark.table(table).collect().map(_.toString).sorted === before,
        "compaction changed artifact rows")
      assert(filesPerDir(dir).values.forall(_ == 1))
      // keep=true still arrives as a PartitionFilter
      val plan = CorpusArtifact.readKept(spark, table)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("keep"),
        s"partition pruning lost:\n$plan")
      // nshards metadata survived: a post-compaction append still works
      // and a marker replay is still a no-op
      val n = spark.table(table).count()
      CorpusArtifact.append(docs.where(col("doc_id") % 2 === 1), dir, table,
        doneMarker = Some("m1"))
      assert(spark.table(table).count() == n, "marker lost in compaction")
      CorpusArtifact.append(
        docs.where(col("doc_id") % 2 === 1)
          .withColumn("doc_id", col("doc_id") + 1000000L), dir, table,
        doneMarker = Some("m2"))
      assert(spark.table(table).count() > n, "post-compaction append broken")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("shingle index: compaction keeps rows, one file per bucket, the " +
      "exchange-free bucketed join, the n property, and later appends") {
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val train = docs.where(col("doc_id") % 3 =!= 2)
    val eval = docs.where(col("doc_id") % 3 === 2)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
    val dir = Files.createTempDirectory("graft_cmp_sh").toString
    val table = "graft_spec_cmp_sh"
    try {
      Dedup.writeShingleIndex(train.where(col("doc_id") % 3 === 0),
        s"$dir/a", table, n = 3, buckets = 8)
      Dedup.appendToShingleIndex(train.where(col("doc_id") % 3 === 1), table,
        doneMarker = Some("s1"))
      val before = spark.table(table)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(filesPerDir(s"$dir/a").values.exists(_ >= 2))

      Dedup.compactShingleIndex(spark, table)

      val after = spark.table(table)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after === before, "compaction changed the index rows")
      // a bucketed table is a FLAT dir of `..._000NN...` files: one
      // file per bucket means exactly `buckets` files with distinct
      // bucket-id suffixes
      val bucketIds = dataFiles(s"$dir/a")
        .map(_.getFileName.toString)
        .map { n => val m = "_(\\d{5})\\.".r.findFirstMatchIn(n)
          assert(m.nonEmpty, s"non-bucketed file after compaction: $n"); m.get.group(1) }
      assert(bucketIds.size == 8 && bucketIds.distinct.size == 8,
        s"expected one file per bucket, got: $bucketIds")
      // bucketed sweep still exchange-free below the join
      Dedup.writeShingleIndex(eval, s"$dir/e", "graft_spec_cmp_ev", n = 3,
        buckets = 8, outIdCol = "eval_id")
      val sweep = Dedup.contaminationFromShingleIndexes(
        Dedup.readShingleIndex(spark, table),
        Dedup.readShingleIndex(spark, "graft_spec_cmp_ev"), minOverlap = 3)
      val p = sweep.queryExecution.executedPlan.toString
      assert("Bucketed: true".r.findAllIn(p).size == 2,
        s"bucketed scan lost after compaction:\n$p")
      assert("Exchange (hash|range)partitioning".r.findAllIn(p).size <= 1,
        s"only the pair aggregation may exchange:\n$p")
      // the shingle-size property survived (the table was never
      // dropped): a later append still derives n = 3 and a marker
      // replay is still a no-op
      Dedup.appendToShingleIndex(train.where(col("doc_id") % 3 === 1), table,
        doneMarker = Some("s1"))
      assert(spark.table(table)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === before,
        "marker lost in compaction — replayed batch duplicated")
      Dedup.appendToShingleIndex(
        eval.withColumn("doc_id", col("doc_id") + 1000000L), table)
      Dedup.writeShingleIndex(
        train.unionByName(eval.withColumn("doc_id", col("doc_id") + 1000000L)),
        s"$dir/r", "graft_spec_cmp_reb", n = 3, buckets = 8)
      assert(spark.table(table)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        === spark.table("graft_spec_cmp_reb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        "post-compaction append != rebuild (n property damaged?)")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql("DROP TABLE IF EXISTS graft_spec_cmp_ev")
      spark.sql("DROP TABLE IF EXISTS graft_spec_cmp_reb")
    }
  }

  test("interrupted-compaction leftover refuses loudly; maxRecordsPerFile splits") {
    val df = (0L until 100L).map(i => (i, i % 2)).toDF("id", "part")
    val dir = Files.createTempDirectory("graft_cmp_edge").toString + "/t"
    df.write.partitionBy("part").parquet(dir)
    // simulate the crash window: the original moved aside
    Files.createDirectory(Paths.get(dir + "__compact_old"))
    val e = intercept[IllegalArgumentException] {
      Compaction.compactPartitionedDir(spark, dir, Seq("part"))
    }
    assert(e.getMessage.contains("interrupted compaction"))
    Files.delete(Paths.get(dir + "__compact_old"))
    // jumbo partitions re-split at maxRecordsPerFile
    Compaction.compactPartitionedDir(spark, dir, Seq("part"),
      maxRecordsPerFile = 20L)
    assert(filesPerDir(dir).values.forall(n => n >= 3),
      s"expected ~ceil(50/20) files per dir: ${filesPerDir(dir)}")
    assert(spark.read.parquet(dir).count() == 100L)
    // and a wrong partition column fails before anything is touched
    val e2 = intercept[IllegalArgumentException] {
      Compaction.compactPartitionedDir(spark, dir, Seq("nope"))
    }
    assert(e2.getMessage.contains("no partition column"))
  }
}
