package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-version MANIFEST at rest, and the version DIFF served off
  * two manifests (probe x141) — the reproducibility audit a 100 TB
  * training pipeline runs between corpus versions ("what changed
  * between the data we trained v3 on and today's corpus?") without
  * ever comparing document bodies.
  *
  * The manifest is the at-rest family applied to content identity:
  * one row per ingested document — (id, ck) where `ck` is a 60-bit
  * md5 content key over the declared content columns — persisted
  * under id-hash bucket (`mb`) directories. Build pays one corpus
  * pass; appends are O(batch); and because rows are KEYED FACTS
  * (like the constellation tokens and the sample rows, unlike the
  * SUM-merged sketches), a replayed append is VALUE-harmless — the
  * read dedups by the (id, ck) pair — while `doneMarker` still bounds
  * row count and the commit stays crash-atomic.
  *
  * [[diffManifests]] compares two manifests PAIR-wise and reports
  * per-id status:
  *   - `added`     — the id has pairs only in B;
  *   - `removed`   — only in A;
  *   - `changed`   — pairs on both sides but some pair unshared (any
  *                   content-column edit moves the md5 key);
  *   - `unchanged` — identical pair sets.
  * The pair-set semantics make the diff exact even when one version
  * legitimately carries multiple content variants under one id (the
  * set difference is what changed). The join runs over (id, ck)
  * rows ONLY — two integer-ish columns, ~1% of corpus bytes — so the
  * one shuffle it costs is manifest-sized, never corpus-sized; both
  * manifests bucket ids with the SAME salted hash, so an external
  * engine (or a per-bucket merge job) can also diff bucket-by-bucket.
  *
  * Keys are md5-derived (salts "manifest_" / "manifestmb_"), the
  * x40/x113 engine-portability stance: the DuckDB oracle re-derives
  * every key, bucket and status from raw data.
  */
object Manifest {

  /** The 60-bit content key over the declared content columns
    * (joined on the unit separator so column values can't alias by
    * concatenation). A null component hashes like the empty string;
    * rows whose EVERY content column is null still get a key. */
  def contentKey(contentCols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("\u001f",
      lit("manifest_") +: contentCols.map(_.cast("string")): _*)), 1, 15),
      16, 10).cast("long")

  /** The id-hash bucket — salted independently of every other md5
    * bucketing in the library. */
  def idBucket(id: Column, nBuckets: Int): Column =
    conv(substring(md5(concat(lit("manifestmb_"), id.cast("string"))),
      1, 15), 16, 10).cast("long") % nBuckets

  private def manifestRows(df: DataFrame, idCol: String,
                           contentCols: Seq[String],
                           nBuckets: Int): DataFrame =
    df.select(col(idCol),
      contentKey(contentCols.map(col)).as("ck"),
      idBucket(col(idCol), nBuckets).as("mb"))

  /** Build the manifest of one corpus version: one pass, (id, ck)
    * persisted under the id-bucket directories. */
  def writeManifest(df: DataFrame, path: String, idCol: String = "doc_id",
                    contentCols: Seq[String] = Seq("text"),
                    nBuckets: Int = 64): Unit = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    manifestRows(df, idCol, contentCols, nBuckets)
      .write.partitionBy("mb").mode("overwrite").parquet(s"$path/rows")
    Seq((idCol, contentCols, nBuckets))
      .toDF("id_col", "content_cols", "n_buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def manifestMeta(spark: SparkSession,
                           path: String): (String, Seq[String], Int) = {
    val r = spark.read.parquet(s"$path/meta")
      .select("id_col", "content_cols", "n_buckets").head()
    (r.getString(0), r.getSeq[String](1), r.getInt(2))
  }

  /** Append an ingest batch — O(batch), geometry off the persisted
    * meta; rows are keyed facts, so a replay is value-harmless at
    * read (the pair dedup absorbs it) and the marker bounds row
    * count. Crash-atomic via the shared protocol. */
  def appendToManifest(batch: DataFrame, path: String,
                       doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (idCol, contentCols, nBuckets) = manifestMeta(spark, path)
      manifestRows(batch, idCol, contentCols, nBuckets)
        .write.partitionBy("mb").mode("overwrite")
        .parquet(s"$staging/rows")
    }
  }

  /** Every (id, ck) pair ever ingested, deduplicated — replayed
    * batches and genuine exact re-ingests collapse. */
  def readManifest(spark: SparkSession, path: String): DataFrame = {
    val (idCol, _, _) = manifestMeta(spark, path)
    spark.read.parquet(s"$path/rows")
      .select(col(idCol), col("ck")).distinct()
  }

  /** Compact after an append schedule: the deduplicated pairs land
    * under the same bucket layout, read-equivalent. */
  def compactManifest(spark: SparkSession, path: String): Unit = {
    val (idCol, _, nBuckets) = manifestMeta(spark, path)
    Compaction.compactPartitionedValueDir(spark, s"$path/rows",
      Seq("mb")) {
      readManifest(spark, path)
        .withColumn("mb", idBucket(col(idCol), nBuckets))
    }
  }

  /** Per-id status of version B against version A, INCLUDING
    * `unchanged` rows — see the object Scaladoc for the pair-set
    * semantics. Refuses manifests with differing id/content schemas
    * (their keys would be incomparable, and every doc would read
    * `changed`). */
  def diffManifests(spark: SparkSession, pathA: String,
                    pathB: String): DataFrame = {
    val (idA, ccA, _) = manifestMeta(spark, pathA)
    val (idB, ccB, _) = manifestMeta(spark, pathB)
    require(idA == idB && ccA == ccB,
      s"manifests are incomparable: ($idA, $ccA) vs ($idB, $ccB) — " +
        "keys from different content columns would diff every row")
    val a = readManifest(spark, pathA).withColumn("in_a", lit(true))
    val b = readManifest(spark, pathB).withColumn("in_b", lit(true))
    a.join(b, Seq(idA, "ck"), "full_outer")
      .na.fill(false, Seq("in_a", "in_b"))
      .groupBy(col(idA))
      .agg(max(col("in_a")).as("has_a"), max(col("in_b")).as("has_b"),
        max(col("in_a") =!= col("in_b")).as("some_unshared"))
      .select(col(idA),
        when(!col("has_a"), "added")
          .when(!col("has_b"), "removed")
          .when(col("some_unshared"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Only the differences — the audit report. */
  def diff(spark: SparkSession, pathA: String, pathB: String): DataFrame =
    diffManifests(spark, pathA, pathB)
      .where(col("status") =!= "unchanged")

  /** Bounded per-status counts — the one-line version summary. */
  def diffSummary(spark: SparkSession, pathA: String,
                  pathB: String): DataFrame =
    diffManifests(spark, pathA, pathB)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
