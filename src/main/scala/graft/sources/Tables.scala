package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema'd loaders for the driver-generated testdata tables
  * (TESTDATA.md). Parquet carries its own schema; these helpers add the
  * one normalization Spark needs: `events.ts` is written as parquet
  * TIMESTAMP(NANOS), which Spark cannot represent natively — with
  * `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as a long
  * that we truncate to microseconds (identical to what DuckDB does when
  * it reads the same file), keeping both engines' view of the column
  * byte-identical.
  */
object Tables {
  /** Analyzed-plan cache: `spark.read.parquet` builds a fresh file
    * index and re-reads footers for schema inference on every call —
    * measurable when a 55-probe suite opens the same 10 files. Keyed
    * by session too (plans are session-bound). This is the engine's
    * little catalog; on a cluster the same role is played by the
    * metastore. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Drop entries owned by stopped sessions so their analyzed plans and
    * file indexes don't outlive the session. Caveat (documented): within
    * a live session a cached path is never re-scanned — call
    * `invalidate()` after rewriting files under a cached directory. */
  private def evictStopped(): Unit =
    cache.keySet.removeIf { case (s, _) => s.sparkContext.isStopped }

  /** Forget all cached plans (e.g. after files changed on disk). */
  def invalidate(): Unit = cache.clear()

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    evictStopped()
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })
  }

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** events with `ts` as a microsecond TimestampType regardless of how
    * the parquet file encoded it. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos → micros, floor division (matches DuckDB's ns→us read)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
