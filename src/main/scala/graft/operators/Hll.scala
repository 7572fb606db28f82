package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog over a column — the DISTINCT-COUNT sketch of the
  * curation toolkit, next to CountMin (point frequency), MG heavy
  * hitters (top lists) and the shingle bloom (membership): "how many
  * distinct urls/tokens/documents", answerable from 2^p small
  * registers per shard instead of a corpus-wide distinct shuffle.
  * Spark's own `approx_count_distinct` is HLL++ too, but its binary
  * buffer is opaque — this formulation keeps the REGISTERS as a plain
  * (bucket, rho) relation, so shard sketches persist as parquet,
  * merge with a `greatest` per bucket (order- and tree-shape-
  * invariant, the mergeability that makes the sketch work at 100 TB),
  * and every step is mirrorable by an independent SQL engine (probes
  * x113/x114).
  *
  * All hashing is md5-HEX-STRING arithmetic (the CountMin stance):
  * bucket = first p/4 hex chars, rho = 1 + leading-zero BITS of the
  * next 12 hex chars (48 bits; 49 when all zero) — deterministic,
  * engine-portable, no JVM hashCode. The estimator's harmonic sum is
  * computed as the EXACT integer S = Σ 2^(49−rho) (every term a
  * power of two ≥ 1, summed as BIGINT), so the estimate is one
  * double division at the end — no order-sensitive float
  * accumulation anywhere (raw = α·m²·2⁴⁹ / S). Small-range
  * correction (Flajolet et al. 2007): when raw ≤ 2.5·m and empty
  * buckets exist, linear counting m·ln(m/V) takes over.
  */
object Hll {

  /** Registers per bucket can encode 48 suffix bits; an all-zero
    * suffix scores 49. Exact powers 2^(49−rho) then fit a long. */
  private val MaxRho = 49

  private def require4(p: Int): Unit =
    require(p >= 4 && p <= 16 && p % 4 == 0,
      s"p must be 4, 8, 12 or 16 (hex-aligned buckets); got $p")

  /** Bucket of a value: first p/4 md5 hex chars. Null values hash to
    * a null bucket and are dropped by [[registers]] (COUNT DISTINCT
    * ignores nulls). */
  def bucket(c: Column, p: Int): Column = {
    require4(p)
    conv(substring(md5(c.cast("string")), 1, p / 4), 16, 10).cast("int")
  }

  /** Rank of a value: 1 + leading-zero bits of the 48 bits after the
    * bucket chars; 49 when all 48 are zero. Pure hex-string
    * arithmetic (zero-run length + a 16-way CASE on the first
    * nonzero digit), identical in any engine with md5 + regex. */
  def rho(c: Column, p: Int): Column = {
    require4(p)
    val suffix = substring(md5(c.cast("string")), p / 4 + 1, 12)
    val zeros = length(regexp_extract(suffix, "^(0*)", 1))
    val firstNz = suffix.substr(zeros + lit(1), lit(1))
    val nzBits = when(firstNz === "1", 3)
      .when(firstNz.isin("2", "3"), 2)
      .when(firstNz.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(zeros === 12, MaxRho).otherwise(zeros * 4 + nzBits + 1)
  }

  /** The sketch: (bucket, rho) with ALL 2^p buckets present (empty
    * buckets carry rho = 0 — they must reach the estimator, where
    * they dominate the harmonic sum and drive linear counting). ONE
    * map pass + ONE partial-aggregable max per bucket; the densify
    * join is 2^p bounded rows. This is the shape that makes the
    * sketch worth having at 100 TB: per-shard state is 2^p small
    * ints no matter the corpus. */
  def registers(df: DataFrame, c: Column, p: Int = 8): DataFrame = {
    require4(p)
    val spark = df.sparkSession
    val got = df.where(c.isNotNull)
      .select(bucket(c, p).as("bucket"), rho(c, p).as("rho"))
      .groupBy("bucket").agg(max("rho").as("rho"))
    spark.range(1 << p).select(col("id").cast("int").as("bucket"))
      .join(broadcast(got), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("rho"), lit(0)).as("rho"))
  }

  /** Merge shard sketches: element-wise max per bucket. Exact and
    * associative/commutative — any merge tree over any shard split
    * yields the registers of the union (HllSpec pins shard-merge ≡
    * global bit-identically). */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.map(_.select(col("bucket"), col("rho")))
      .reduce(_ unionByName _)
      .groupBy("bucket").agg(max("rho").as("rho"))

  /** Cardinality estimate from a (bucket, rho) sketch: one bounded
    * aggregation returning (s_scaled, v_zero, estimate) — s_scaled
    * is the EXACT integer Σ 2^(49−rho) certified as a BIGINT by the
    * oracle, v_zero the empty-bucket count, estimate the corrected
    * double rounded to 6 decimals. */
  def estimate(sketch: DataFrame, p: Int = 8): DataFrame = {
    require4(p)
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    // α·m²·2⁴⁹ as one double literal (exact product of doubles both
    // engines compute identically from the same constants)
    val scale = alpha * m * m * math.pow(2.0, MaxRho)
    sketch
      // 2^(49−rho) via double pow is EXACT (a power of two ≤ 2^49),
      // then cast to BIGINT so the harmonic sum is integer arithmetic
      .agg(sum(pow(lit(2.0), lit(MaxRho) - col("rho")).cast("long"))
          .as("s_scaled"),
        sum(when(col("rho") === 0, 1L).otherwise(0L)).as("v_zero"))
      .select(col("s_scaled"), col("v_zero"),
        round(
          when(col("v_zero") > 0 &&
              lit(scale) / col("s_scaled") <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")))
            .otherwise(lit(scale) / col("s_scaled")), 6).as("estimate"))
  }

  /** GROUPED sketch — per-key distinct counts, the form a curation
    * pipeline actually asks ("distinct urls per domain", "distinct
    * tokens per language"): (groupCols..., bucket, rho) with ONE
    * partial-aggregable max per (group, bucket). Registers are SPARSE
    * — only observed buckets appear (rho ≥ 1 by construction), and an
    * absent (group, bucket) row means rho 0. That is the deliberate
    * scale choice: the global [[registers]] densify is 2^p bounded
    * rows, but a grouped densify is |groups|·2^p — at 100 TB a
    * 100M-domain corpus would pay 25.6B register rows for padding.
    * [[estimateBy]] folds the absent buckets back in arithmetically,
    * and [[mergeBy]] is sparse-safe (max of a present and an absent
    * row is the present row). Per-group state stays ≤ 2^p rows no
    * matter the corpus. */
  def registersBy(df: DataFrame, c: Column, groupCols: Seq[String],
                  p: Int = 8): DataFrame = {
    require4(p)
    require(groupCols.nonEmpty, "registersBy needs at least one group column")
    val gs = groupCols.map(col)
    df.where(c.isNotNull)
      .select(gs :+ bucket(c, p).as("bucket") :+ rho(c, p).as("rho"): _*)
      .groupBy(gs :+ col("bucket"): _*).agg(max("rho").as("rho"))
  }

  /** Merge grouped shard sketches: per-(group, bucket) max. Sparse-
    * safe and exact — any merge tree over any shard split yields the
    * grouped registers of the union (the [[merge]] argument, per
    * group). */
  def mergeBy(groupCols: Seq[String], sketches: DataFrame*): DataFrame = {
    val keep = groupCols ++ Seq("bucket", "rho")
    sketches.map(_.select(keep.map(col): _*))
      .reduce(_ unionByName _)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("rho"))
  }

  // ---------------------------------------------------------------
  // The at-rest sketch artifact — grouped registers persisted with
  // the artifact-family conventions (int8/IVF-PQ/shingle/bloom/BM25
  // indexes): build once, append O(batch), estimate without ever
  // re-deriving registers from raw data. Layout under `path`:
  //   registers/  (groupCols..., bucket, rho) — SPARSE grouped
  //               registers, one file set per build/append batch;
  //               [[mergeBy]] at read time folds them (max is
  //               associative/commutative/idempotent, so ANY append
  //               schedule — or even a replayed batch — yields the
  //               union's registers)
  //   meta/       (p, value_col, group_cols) — the sketch geometry
  //               AND the hashed column name, persisted so an append
  //               can never hash a different column or precision into
  //               the artifact
  // ---------------------------------------------------------------

  /** Build the at-rest sketch: one map pass + one partial-aggregable
    * max over `df`, persisted sparse. The daily-cadence distinct-count
    * pipeline pays the raw scan ONCE here; every later reading is
    * ≤ |groups|·2^p register rows, and every later day appends only
    * its batch. */
  def writeSketch(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  path: String, p: Int = 8): Unit = {
    require4(p)
    val spark = df.sparkSession
    import spark.implicits._
    registersBy(df, col(valueCol), groupCols, p)
      .write.mode("overwrite").parquet(s"$path/registers")
    Seq((p, valueCol, groupCols))
      .toDF("p", "value_col", "group_cols")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The persisted sketch geometry — derived from the ARTIFACT, never
    * from a caller (a p or column mismatch would silently merge
    * incompatible registers). */
  private def sketchMeta(spark: org.apache.spark.sql.SparkSession,
                         path: String): (Int, String, Seq[String]) = {
    val r = spark.read.parquet(s"$path/meta")
      .select("p", "value_col", "group_cols").head()
    (r.getInt(0), r.getString(1), r.getSeq[String](2))
  }

  /** Append a BATCH to the persisted sketch — O(batch): only the new
    * rows are hashed (the sketch geometry comes off the artifact's
    * meta), and the batch's sparse registers land as additional files
    * next to the existing ones; nothing is read back or rewritten.
    * Because register merge is max — idempotent as well as
    * associative/commutative — append ≡ rebuild-from-union EXACTLY,
    * and a replayed batch is VALUE-harmless even without the marker
    * (it re-lands rows the max absorbs); `doneMarker` still gates
    * replays to keep the artifact's row count and scan cost bounded
    * (HllSpec pins both properties). */
  def appendToSketch(batch: DataFrame, path: String,
                     doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (p, valueCol, groupCols) = sketchMeta(spark, path)
      registersBy(batch, col(valueCol), groupCols, p)
        .write.mode("overwrite").parquet(s"$staging/registers")
    }
  }

  /** The merged grouped registers of everything ever written or
    * appended — one [[mergeBy]] over the persisted per-batch rows
    * (≤ batches·|groups|·2^p in, ≤ |groups|·2^p out). */
  def readRegisters(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame = {
    val (_, _, groupCols) = sketchMeta(spark, path)
    mergeBy(groupCols, spark.read.parquet(s"$path/registers"))
  }

  /** Compact the persisted registers after an append schedule: rather
    * than merely collapsing files, the rewrite lands the MERGED
    * registers (merge is the artifact's value semantics, so the
    * result is read-equivalent while shrinking batches·|groups|·2^p
    * rows back to ≤ |groups|·2^p in one file set). Meta and replay
    * markers live outside registers/ and are untouched; see
    * [[Compaction]] for the crash stance. */
  def compactSketch(spark: org.apache.spark.sql.SparkSession,
                    path: String): Unit = {
    val (_, _, groupCols) = sketchMeta(spark, path)
    Compaction.compactValueDir(spark, s"$path/registers")(
      mergeBy(groupCols, spark.read.parquet(s"$path/registers")))
  }

  /** Per-group cardinality estimates straight off the artifact —
    * [[readRegisters]] piped into [[estimateBy]] under the persisted
    * geometry; raw data is never touched (probe x124 certifies the
    * whole at-rest chain against a from-raw derivation). */
  def estimateFromSketch(spark: org.apache.spark.sql.SparkSession,
                         path: String): DataFrame = {
    val (p, _, groupCols) = sketchMeta(spark, path)
    estimateBy(readRegisters(spark, path), groupCols, p)
  }

  /** Per-group cardinality estimates from a grouped sketch:
    * (groupCols..., s_scaled, v_zero, estimate). Accepts SPARSE
    * registers — each of the (m − count) absent buckets contributes
    * the rho-0 term 2⁴⁹ to the exact integer harmonic sum and 1 to
    * v_zero — and degrades gracefully to densified input (an explicit
    * rho-0 row contributes identically). Same Flajolet small-range
    * correction as [[estimate]], per group; one bounded aggregation
    * over ≤ |groups|·2^p rows. */
  def estimateBy(sketch: DataFrame, groupCols: Seq[String],
                 p: Int = 8): DataFrame = {
    require4(p)
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val scale = alpha * m * m * math.pow(2.0, MaxRho)
    val gs = groupCols.map(col)
    val absent = lit(m.toLong) - count(lit(1))
    sketch.groupBy(gs: _*)
      .agg(
        (sum(pow(lit(2.0), lit(MaxRho) - col("rho")).cast("long")) +
          absent * lit(1L << MaxRho)).as("s_scaled"),
        (sum(when(col("rho") === 0, 1L).otherwise(0L)) + absent)
          .as("v_zero"))
      .select(gs ++ Seq(col("s_scaled"), col("v_zero"),
        round(
          when(col("v_zero") > 0 &&
              lit(scale) / col("s_scaled") <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")))
            .otherwise(lit(scale) / col("s_scaled")), 6).as("estimate")): _*)
  }
}
