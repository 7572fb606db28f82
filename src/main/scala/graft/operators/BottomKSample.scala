package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bottom-k-by-hash uniform sample, at rest — the SAMPLE member of the
  * at-rest artifact family (probe x132), and its second IDEMPOTENT
  * member after the HLL registers.
  *
  * The primitive: key every row by a deterministic 60-bit hash of its
  * id and keep the k smallest keys. That set is
  *   - a uniform random k-subset of everything ingested (the hash is
  *     the randomness, fixed once — so it is reproducible across runs,
  *     engines, partitionings and cluster sizes);
  *   - EXACTLY mergeable: bottomK(A ∪ B) = bottomK(bottomK(A) ∪
  *     bottomK(B)) — the global sample of a union is computable from
  *     per-batch samples, so append ≡ rebuild bit-for-bit;
  *   - stable under growth the way an RNG sample is not: a row leaves
  *     the sample only when displaced by a smaller key, never because
  *     the corpus was re-shuffled.
  * This is what a 100 TB pipeline wants for "give me 10k uniformly
  * random documents for eval/inspection" — after the one build pass,
  * every later read touches ≤ batches·k persisted rows, never the
  * corpus, and every ingest batch contributes its own bottom-k in the
  * pass it already pays.
  *
  * Replay semantics (the family contrast, stated loudly): rows are
  * keyed facts deduplicated at read, and min-k of a set ignores
  * multiplicity — so like the HLL max-merge and UNLIKE the SUM-merged
  * sketches, a replayed append is VALUE-harmless even without the
  * marker (the same rows land twice and collapse in the read's
  * distinct). `doneMarker` still gates replays to keep row count and
  * scan cost bounded, and the commit runs the shared crash-atomic
  * protocol ([[Compaction.appendWithMarker]]).
  *
  * Layout under `path` (family conventions):
  *   rows/  (skey, <idCol>, payload...) — ≤ k rows per build/append
  *          batch
  *   meta/  (k, id_col, payload_cols) — geometry off the artifact,
  *          never the caller
  *
  * The key is md5-derived (`md5("bksample_" || id)`, first 15 hex
  * digits = 60 bits), NOT a JVM hash — the x40/x113 portability
  * stance: another engine (or the DuckDB oracle) computes the same
  * keys and selects the same rows. The salt keeps sample membership
  * independent of [[Sampling.deterministicSample]] / `hashSplit` /
  * mixture bucketing, so composing them never correlates.
  */
object BottomKSample {

  /** The 60-bit sample key of an id — uniform, engine-portable. */
  def sampleKey(id: Column): Column =
    conv(substring(md5(concat(lit("bksample_"), id.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** The exact global bottom-k of `df` by [[sampleKey]] (ties — md5
    * collisions — break by id). Executes as TakeOrderedAndProject: a
    * bounded per-partition heap + one k-row merge at the driver, never
    * a full sort. */
  def bottomK(df: DataFrame, k: Int, idCol: String,
              payloadCols: Seq[String]): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    df.select((sampleKey(col(idCol)).as("skey") +:
        col(idCol) +: payloadCols.map(col)): _*)
      .orderBy(col("skey"), col(idCol))
      .limit(k)
  }

  /** Build the at-rest sample: one corpus pass, ≤ k rows persisted. */
  def writeSample(df: DataFrame, path: String, k: Int,
                  idCol: String = "doc_id",
                  payloadCols: Seq[String] = Seq.empty): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    bottomK(df, k, idCol, payloadCols)
      .write.mode("overwrite").parquet(s"$path/rows")
    Seq((k, idCol, payloadCols)).toDF("k", "id_col", "payload_cols")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def sampleMeta(spark: SparkSession,
                         path: String): (Int, String, Seq[String]) = {
    val r = spark.read.parquet(s"$path/meta")
      .select("k", "id_col", "payload_cols").head()
    (r.getInt(0), r.getString(1), r.getSeq[String](2))
  }

  /** Append a BATCH — O(batch): the batch's own bottom-k (geometry off
    * the persisted meta) lands as ≤ k additional rows; the existing
    * sample is never read. Exact by the merge identity on the object
    * Scaladoc. */
  def appendToSample(batch: DataFrame, path: String,
                     doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (k, idCol, payloadCols) = sampleMeta(spark, path)
      bottomK(batch, k, idCol, payloadCols)
        .write.mode("overwrite").parquet(s"$staging/rows")
    }
  }

  /** The exact global bottom-k sample of everything ever written or
    * appended: dedup the ≤ batches·k persisted rows BY SAMPLE IDENTITY
    * (skey, id) — replayed batches collapse here, min-k ignores
    * multiplicity — then one bounded TakeOrdered. Never touches the
    * corpus.
    *
    * Payload stance: membership is a function of the id alone, so an
    * id re-landed with a DIFFERENT payload (upstream payload drift
    * across replays) still occupies exactly one of the k slots; which
    * of the drifted payloads it carries is whichever row the dedup
    * keeps (arbitrary — under the family's stable-payload assumption
    * all candidate rows are identical and the read is deterministic).
    * Pipelines whose payloads genuinely mutate should re-read payloads
    * by id from the source of truth instead of trusting the sample's
    * snapshot. */
  def readSample(spark: SparkSession, path: String): DataFrame = {
    val (k, idCol, _) = sampleMeta(spark, path)
    spark.read.parquet(s"$path/rows")
      .dropDuplicates("skey", idCol)
      .orderBy(col("skey"), col(idCol))
      .limit(k)
  }

  /** Compact after an append schedule: land the MERGED sample as the
    * single persisted batch (read-equivalent — the merged sample IS a
    * batch bottom-k of itself). See [[Compaction]] for the crash
    * stance. */
  def compactSample(spark: SparkSession, path: String): Unit =
    Compaction.compactValueDir(spark, s"$path/rows")(
      readSample(spark, path))
}
