package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The OUTPUT side of curation: persist a scored/cleaned corpus as an
  * at-rest training artifact partitioned by (decision, shard), so
  * every downstream consumer partition-PRUNES instead of filtering —
  * a training reader opens only `keep=true` directories (the curation
  * decision never rescans), and `shard` is a deterministic id-hash
  * bucket sized for loader parallelism (the hashSplit contract: stable
  * under corpus growth, engine-portable salted md5). The same at-rest
  * stance as the shingle/IVF/int8 indexes — pay the decision once,
  * read it forever as directory structure.
  */
object CorpusArtifact {

  /** Deterministic shard of an id — salted independently of
    * split/sample/mixture bucketing (salt "shard_"). */
  def shardOf(id: Column, nShards: Int): Column =
    conv(substring(md5(concat(lit("shard_"), id.cast("string"))), 1, 7), 16, 10)
      .cast("long") % nShards

  /** Write the artifact: all input columns + `shard`, partitioned by
    * (`keepCol`, shard), registered as an external table. */
  def write(docs: DataFrame, path: String, table: String,
            nShards: Int = 64, keepCol: String = "keep",
            idCol: String = "doc_id"): Unit = {
    require(table.matches("[A-Za-z0-9_]+(\\.[A-Za-z0-9_]+)?"),
      s"invalid table identifier: $table")
    require(nShards > 0, s"nShards must be positive: $nShards")
    val spark = docs.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    docs.withColumn("shard", shardOf(col(idCol), nShards))
      .write.format("parquet").option("path", path)
      .partitionBy(keepCol, "shard")
      .mode("overwrite").saveAsTable(table)
  }

  /** Append a batch of newly-curated documents to an existing
    * artifact — the incremental-ingest contract of the index family
    * (x104): per-document decisions and the salted shard hash are
    * pure functions of the row, so appending a batch is value-
    * identical to having rebuilt with the union (CorpusArtifactSpec
    * pins it), and a document never migrates shards under growth (the
    * hashSplit stability argument). O(batch): one map pass + a
    * partitioned append; the existing corpus is never read. Pass
    * `doneMarker` (e.g. a micro-batch id) so at-least-once drivers
    * replay as no-ops. Spark's table catalog does not auto-discover
    * appended partitions of an external table, so the append repairs
    * the table metadata (`MSCK REPAIR`) — cheap, metadata-only. */
  def append(docs: DataFrame, path: String, table: String,
             nShards: Int = 64, keepCol: String = "keep",
             idCol: String = "doc_id",
             doneMarker: Option[String] = None): Unit = {
    require(table.matches("[A-Za-z0-9_]+(\\.[A-Za-z0-9_]+)?"),
      s"invalid table identifier: $table")
    val spark = docs.sparkSession
    val markerPath = doneMarker.map(mk =>
      java.nio.file.Paths.get(path, s"_append_${mk}_ok"))
    if (markerPath.exists(java.nio.file.Files.exists(_))) return
    docs.withColumn("shard", shardOf(col(idCol), nShards))
      .write.format("parquet")
      .partitionBy(keepCol, "shard")
      .mode("append").save(path)
    spark.sql(s"MSCK REPAIR TABLE $table")
    markerPath.foreach(p => java.nio.file.Files.write(p,
      Array.emptyByteArray))
  }

  /** The training reader: surviving documents only — `keep=true`
    * arrives at the scan as a PartitionFilter (directory pruning),
    * not a row filter. */
  def readKept(spark: SparkSession, table: String,
               keepCol: String = "keep"): DataFrame =
    spark.table(table).where(col(keepCol) === true)
}
