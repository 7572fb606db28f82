package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest EXACT keyed rollup — the materialized-aggregate member of
  * the at-rest artifact family (probe x136), and the family's first
  * MIXED-merge member.
  *
  * Where the sketches (HLL x124, Count-Min x125, Misra-Gries x126,
  * histogram x130) trade exactness for bounded geometry, the rollup is
  * the EXACT form for the keys a pipeline actually has: per-key
  * (count, sum, min, max) of a value column, for key spaces that are
  * small relative to the corpus but too large / too hot to recompute —
  * per-source document and token totals, per-language length stats,
  * per-host crawl counts, per-day ingest volumes. This is the table a
  * 100 TB training pipeline feeds mixture weighting from (x138): pay
  * one grouped pass per ingest batch, then every planning read touches
  * ≤ batches·|batch keys| persisted rows, never the corpus.
  *
  * Merge semantics, PER COLUMN (the family's merge taxonomy in one
  * relation, stated loudly):
  *   - `n` and `sum_v` merge by SUM — exact in int64, any merge tree,
  *     but NOT idempotent: a replayed batch double-counts, so the
  *     `doneMarker` on [[appendToRollup]] is load-bearing for values
  *     (the Count-Min stance);
  *   - `min_v` / `max_v` merge by MIN/MAX — idempotent: a replay is
  *     value-harmless for them (the HLL stance).
  *   The artifact carries both in one row, so RollupSpec pins that an
  *   unmarked replay shifts n/sum while min/max hold.
  *
  * Layout under `path` (family conventions):
  *   rows/kb=<b>/  per-batch grouped rows (key cols..., n, sum_v,
  *                 min_v, max_v), partitioned by the key-hash bucket
  *                 `kb` so a bounded-key [[lookup]] turns into a
  *                 PARTITION filter — only the queried buckets'
  *                 directories are listed and read (the Bm25 `tb` /
  *                 ClusterRegistry bucket shape);
  *   meta/         (key_cols, value_col, n_buckets) — geometry off the
  *                 artifact, never the caller, so an append can never
  *                 group by different keys or bucket with a different
  *                 modulus.
  *
  * The bucket hash is md5-derived (salt "rollupkb_", keys joined with
  * unit separator 0x1f), NOT a JVM hash — the x40/x113 portability
  * stance: the DuckDB oracle computes the same buckets, and bucket
  * assignment survives engine/partitioning changes. Values are exact
  * integers end to end when the value column is integral, so the
  * certification hash has no rounding surface.
  */
object Rollup {

  /** The 60-bit md5 key-hash bucket of a (possibly composite) key. */
  def keyBucket(keys: Seq[Column], nBuckets: Int): Column =
    conv(substring(md5(concat_ws("\u001f",
      lit("rollupkb_") +: keys.map(_.cast("string")): _*)), 1, 15),
      16, 10).cast("long") % nBuckets

  /** The exact rollup of `df`: one partial-aggregated grouped pass —
    * map-side combine folds each scan partition to ≤ |batch keys|
    * rows before the single shuffle. */
  def rollup(df: DataFrame, keyCols: Seq[String],
             valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("long")).as("sum_v"),
        min(col(valueCol).cast("long")).as("min_v"),
        max(col(valueCol).cast("long")).as("max_v"))
  }

  /** Build the at-rest rollup: one corpus pass, grouped rows persisted
    * under their key-hash bucket directories. */
  def writeRollup(df: DataFrame, path: String, keyCols: Seq[String],
                  valueCol: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    rollup(df, keyCols, valueCol)
      .withColumn("kb", keyBucket(keyCols.map(col), nBuckets))
      .write.partitionBy("kb").mode("overwrite").parquet(s"$path/rows")
    Seq((keyCols, valueCol, nBuckets))
      .toDF("key_cols", "value_col", "n_buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def rollupMeta(spark: SparkSession,
                         path: String): (Seq[String], String, Int) = {
    val r = spark.read.parquet(s"$path/meta")
      .select("key_cols", "value_col", "n_buckets").head()
    (r.getSeq[String](0), r.getString(1), r.getInt(2))
  }

  /** Append a BATCH — O(batch): only the new rows are grouped
    * (geometry off the persisted meta), the batch's ≤ |batch keys|
    * rows land as additional files under their bucket directories;
    * the existing artifact is never read. n/sum merge by SUM, which is
    * NOT idempotent — always pass `doneMarker` from an at-least-once
    * scheduler (the commit is the shared crash-atomic protocol,
    * [[Compaction.appendWithMarker]], so a crash mid-commit cannot
    * double-count either). */
  def appendToRollup(batch: DataFrame, path: String,
                     doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (keyCols, valueCol, nBuckets) = rollupMeta(spark, path)
      rollup(batch, keyCols, valueCol)
        .withColumn("kb", keyBucket(keyCols.map(col), nBuckets))
        .write.partitionBy("kb").mode("overwrite")
        .parquet(s"$staging/rows")
    }
  }

  /** RETRACT a previously-ingested batch from the SUM-merged columns:
    * n and sum_v are a group, so the negated batch rollup is an exact
    * inverse — after retraction, n/sum_v are bit-identical to an
    * artifact that never ingested the batch. The idempotent columns
    * CANNOT be retracted (MIN/MAX are not invertible: the artifact
    * cannot know the runner-up), so the retraction rows carry the
    * merge IDENTITIES (min_v = +∞, max_v = −∞ in long) and the
    * persisted min/max degrade to CONSERVATIVE BOUNDS — min_v ≤ the
    * true minimum of the remaining corpus ≤ max_v — the honest
    * statement of what a mergeable artifact can still guarantee
    * (RollupSpec pins both halves). Same caller contract and marker
    * semantics as [[CountMin.retractFromSketch]]: retract exactly
    * what was ingested, under a FRESH marker id. */
  def retractFromRollup(batch: DataFrame, path: String,
                        doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (keyCols, valueCol, nBuckets) = rollupMeta(spark, path)
      rollup(batch, keyCols, valueCol)
        .withColumn("n", -col("n"))
        .withColumn("sum_v", -col("sum_v"))
        .withColumn("min_v", lit(Long.MaxValue))
        .withColumn("max_v", lit(Long.MinValue))
        .withColumn("kb", keyBucket(keyCols.map(col), nBuckets))
        .write.partitionBy("kb").mode("overwrite")
        .parquet(s"$staging/rows")
    }
  }

  private def mergeBatches(rows: DataFrame,
                           keyCols: Seq[String]): DataFrame =
    rows.groupBy(keyCols.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"), max("max_v").as("max_v"))
      // a fully-retracted key (every ingest retracted) reads n = 0:
      // it must vanish, exactly as if never ingested
      .where(col("n") =!= 0)

  /** The exact rollup of everything ever written or appended: one
    * grouped merge over the ≤ batches·|keys| persisted rows — never
    * the corpus. */
  def readRollup(spark: SparkSession, path: String): DataFrame = {
    val (keyCols, _, _) = rollupMeta(spark, path)
    mergeBatches(spark.read.parquet(s"$path/rows").drop("kb"), keyCols)
  }

  /** How many key values a [[lookup]] may carry — the keys become an
    * in-memory bucket list and a literal IN filter, so they must stay
    * a bounded model artifact, not data. */
  val maxLookupKeys = 10000

  /** Point lookups straight off the artifact for a BOUNDED key
    * relation: the queried keys' buckets become a PARTITION filter
    * (`kb IN ...` — only those directories are listed and read), the
    * surviving ≤ |buckets hit|·batches rows merge, and the queried
    * keys join in by broadcast. A key never ingested returns no row
    * (left-join downstream if absence needs a row). Single-key form:
    * `keys` carries one column named like the artifact's key. */
  def lookup(spark: SparkSession, path: String,
             keys: DataFrame): DataFrame = {
    val (keyCols, _, nBuckets) = rollupMeta(spark, path)
    val missing = keyCols.filterNot(keys.columns.contains)
    require(missing.isEmpty,
      s"lookup keys must carry the artifact's key column(s) " +
        s"${keyCols.mkString(", ")} — missing: ${missing.mkString(", ")}")
    val q = keys.select(keyCols.map(col): _*).distinct()
      .withColumn("kb", keyBucket(keyCols.map(col), nBuckets))
    val rows = q.limit(maxLookupKeys + 1).collect()
    require(rows.length <= maxLookupKeys,
      s"lookup key relation exceeds maxLookupKeys=$maxLookupKeys — " +
        "bounded key sets only; scan readRollup for analytical joins")
    val buckets = rows.map(_.getAs[Long]("kb")).distinct.toSeq
    if (buckets.isEmpty) return readRollup(spark, path).limit(0)
    val pruned = spark.read.parquet(s"$path/rows")
      .where(col("kb").isin(buckets: _*)) // partition filter: kb is a dir
      .drop("kb")
    mergeBatches(pruned, keyCols)
      .join(broadcast(q.drop("kb")), keyCols)
  }

  /** Compact after an append schedule: rewrite the MERGED rows (one
    * row per key) under the same bucket layout — read-equivalent
    * (SUM/MIN/MAX merge trees are exact) while shrinking
    * batches·|keys| rows back to |keys|, and [[lookup]]'s partition
    * pruning survives. See [[Compaction]] for the crash stance. */
  def compactRollup(spark: SparkSession, path: String): Unit = {
    val (keyCols, _, nBuckets) = rollupMeta(spark, path)
    Compaction.compactPartitionedValueDir(spark, s"$path/rows",
      Seq("kb")) {
      mergeBatches(spark.read.parquet(s"$path/rows").drop("kb"), keyCols)
        .withColumn("kb", keyBucket(keyCols.map(col), nBuckets))
    }
  }
}
