package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-bin histogram sketch at rest — the QUANTILE member of the
  * at-rest sketch family (HLL distinct counts x124, Count-Min point
  * frequencies x125, Misra-Gries heavy hitters x126). Where
  * `approx_percentile`'s sketch state is engine-internal and
  * order-sensitive, a fixed-geometry histogram is a plain (bin, n)
  * relation: DETERMINISTIC (bin edges fixed at build), exactly
  * mergeable (int64 SUM per bin — any merge tree, any append
  * schedule), and engine-portable (the x40/x113 stance: another
  * engine can re-derive every cell and every quantile read-off).
  *
  * The error contract is explicit geometry, not probabilistic: a
  * quantile read-off returns the bin CONTAINING the ceil(q·N)-th
  * smallest ingested value (values outside [lo, hi) clamp to the edge
  * bins, so an out-of-range tail degrades the edge bins' answer — the
  * documented trade for a fixed geometry that never rebalances).
  * Resolution = (hi − lo)/nBins.
  *
  * Layout under `path` follows the family conventions:
  *   bins/  (bin, n) sparse nonzero bins, one file set per batch
  *   meta/  (lo, hi, n_bins, value_col) — geometry off the artifact,
  *          never the caller
  * SUM-merge is NOT idempotent (the HLL-vs-CountMin contrast): the
  * append replay marker guards VALUES.
  */
object HistogramSketch {

  /** Bin of `c` under the geometry: clamp(floor((v − lo)/width), 0,
    * nBins−1). Pure double arithmetic both engines evaluate
    * identically (same IEEE ops); null values produce null bins and
    * are dropped by the aggregation. NaN inputs are dropped by
    * [[bins]] alongside nulls — Spark orders NaN above every value,
    * so the least/greatest clamp would otherwise silently route NaN
    * into the TOP bin and shift every later quantile read-off. */
  def binOf(c: Column, lo: Double, hi: Double, nBins: Int): Column = {
    val width = (hi - lo) / nBins
    least(greatest(floor((c.cast("double") - lit(lo)) / lit(width)),
      lit(0.0)), lit((nBins - 1).toDouble)).cast("int")
  }

  /** Sparse nonzero bins of `df`: one partial-aggregated count.
    * Null and NaN values are dropped (see [[binOf]]). */
  def bins(df: DataFrame, c: Column, lo: Double, hi: Double,
           nBins: Int): DataFrame =
    df.where(c.isNotNull && !isnan(c.cast("double")))
      .groupBy(binOf(c, lo, hi, nBins).as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Build the at-rest sketch: one raw scan, persisted sparse. */
  def writeSketch(df: DataFrame, valueCol: String, path: String,
                  lo: Double, hi: Double, nBins: Int = 256): Unit = {
    require(nBins >= 1 && hi > lo, s"bad geometry: [$lo, $hi) / $nBins")
    val spark = df.sparkSession
    import spark.implicits._
    bins(df, col(valueCol), lo, hi, nBins)
      .write.mode("overwrite").parquet(s"$path/bins")
    Seq((lo, hi, nBins, valueCol)).toDF("lo", "hi", "n_bins", "value_col")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def sketchMeta(spark: org.apache.spark.sql.SparkSession,
                         path: String): (Double, Double, Int, String) = {
    val r = spark.read.parquet(s"$path/meta")
      .select("lo", "hi", "n_bins", "value_col").head()
    (r.getDouble(0), r.getDouble(1), r.getInt(2), r.getString(3))
  }

  /** Append a BATCH — O(batch), geometry off the persisted meta; the
    * marker is load-bearing (SUM double-counts a replay). */
  def appendToSketch(batch: DataFrame, path: String,
                     doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (lo, hi, nBins, valueCol) = sketchMeta(spark, path)
      bins(batch, col(valueCol), lo, hi, nBins)
        .write.mode("overwrite").parquet(s"$staging/bins")
    }
  }

  /** RETRACT a previously-ingested batch: bin counts are SUM-merged
    * (a group), so the negated bins are an exact inverse — quantile
    * read-offs after retraction are bit-identical to an artifact that
    * never saw the batch. Same caller contract and marker semantics
    * as [[CountMin.retractFromSketch]]: retract exactly what was
    * ingested, under a FRESH marker id. */
  def retractFromSketch(batch: DataFrame, path: String,
                        doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (lo, hi, nBins, valueCol) = sketchMeta(spark, path)
      bins(batch, col(valueCol), lo, hi, nBins)
        .withColumn("n", -col("n"))
        .write.mode("overwrite").parquet(s"$staging/bins")
    }
  }

  /** Merged bins of everything ingested (≤ nBins rows out). */
  def readBins(spark: org.apache.spark.sql.SparkSession,
               path: String): DataFrame =
    spark.read.parquet(s"$path/bins")
      .groupBy("bin").agg(sum("n").as("n"))

  /** Compact after an append schedule (read-equivalent, ≤ nBins
    * rows; see [[Compaction]] for the crash stance). */
  def compactSketch(spark: org.apache.spark.sql.SparkSession,
                    path: String): Unit =
    Compaction.compactValueDir(spark, s"$path/bins")(readBins(spark, path))

  // --- The GROUPED histogram (probe x145): one distribution PER KEY
  // (per source/lang/host), the monitoring table of a multi-source
  // pipeline — per-group quantile thresholds and a per-group drift
  // report from one artifact. Same geometry/merge/replay semantics as
  // the global form, with bins keyed by the group and the rows
  // PARTITIONED by it, so one group's read prunes to its directory. --

  /** Sparse per-(group, bin) counts — one partial-aggregated pass. */
  def groupedBins(df: DataFrame, groupCol: String, c: Column, lo: Double,
                  hi: Double, nBins: Int): DataFrame =
    df.where(c.isNotNull && !isnan(c.cast("double")))
      .groupBy(col(groupCol), binOf(c, lo, hi, nBins).as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Build the grouped at-rest sketch (layout: bins/<groupCol>=<g>/,
    * meta/ with the group column recorded). */
  def writeGroupedSketch(df: DataFrame, valueCol: String,
                         groupCol: String, path: String, lo: Double,
                         hi: Double, nBins: Int = 256): Unit = {
    require(nBins >= 1 && hi > lo, s"bad geometry: [$lo, $hi) / $nBins")
    val spark = df.sparkSession
    import spark.implicits._
    groupedBins(df, groupCol, col(valueCol), lo, hi, nBins)
      .write.partitionBy(groupCol).mode("overwrite")
      .parquet(s"$path/bins")
    Seq((lo, hi, nBins, valueCol, groupCol))
      .toDF("lo", "hi", "n_bins", "value_col", "group_col")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def groupedMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): (Double, Double, Int, String, String) = {
    val r = spark.read.parquet(s"$path/meta")
      .select("lo", "hi", "n_bins", "value_col", "group_col").head()
    (r.getDouble(0), r.getDouble(1), r.getInt(2), r.getString(3),
      r.getString(4))
  }

  /** Append a BATCH — O(batch); the marker guards values (SUM). */
  def appendToGroupedSketch(batch: DataFrame, path: String,
                            doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (lo, hi, nBins, valueCol, groupCol) = groupedMeta(spark, path)
      groupedBins(batch, groupCol, col(valueCol), lo, hi, nBins)
        .write.partitionBy(groupCol).mode("overwrite")
        .parquet(s"$staging/bins")
    }
  }

  /** Retraction — the exact inverse, as [[retractFromSketch]]. */
  def retractFromGroupedSketch(batch: DataFrame, path: String,
                               doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (lo, hi, nBins, valueCol, groupCol) = groupedMeta(spark, path)
      groupedBins(batch, groupCol, col(valueCol), lo, hi, nBins)
        .withColumn("n", -col("n"))
        .write.partitionBy(groupCol).mode("overwrite")
        .parquet(s"$staging/bins")
    }
  }

  /** Merged per-(group, bin) counts (≤ |groups|·nBins rows out). */
  def readGroupedBins(spark: org.apache.spark.sql.SparkSession,
                      path: String): DataFrame = {
    val (_, _, _, _, groupCol) = groupedMeta(spark, path)
    spark.read.parquet(s"$path/bins")
      .groupBy(col(groupCol), col("bin")).agg(sum("n").as("n"))
      .where(col("n") =!= 0) // fully-retracted bins vanish
  }

  /** Compact after an append schedule — merged rows under the same
    * group layout, read-equivalent, pruning survives. */
  def compactGroupedSketch(spark: org.apache.spark.sql.SparkSession,
                           path: String): Unit = {
    val (_, _, _, _, groupCol) = groupedMeta(spark, path)
    Compaction.compactPartitionedValueDir(spark, s"$path/bins",
      Seq(groupCol))(readGroupedBins(spark, path))
  }

  /** PER-GROUP quantile read-offs: for each group and q, the bin
    * containing that group's ceil(q·N_g)-th smallest value — per-group
    * thresholds from one artifact. The cumulative window partitions by
    * the group over ≤ |groups|·nBins rows (bounded by construction). */
  def groupedQuantiles(spark: org.apache.spark.sql.SparkSession,
                       path: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"qs must be in (0, 1]: $qs")
    import spark.implicits._
    val (lo, hi, nBins, _, groupCol) = groupedMeta(spark, path)
    val width = (hi - lo) / nBins
    val cum = readGroupedBins(spark, path)
      .withColumn("cum", sum("n").over(
        Window.partitionBy(col(groupCol)).orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, 0)))
    val total = cum.groupBy(col(groupCol)).agg(max("cum").as("n_total"))
    qs.toDF("q").crossJoin(broadcast(total))
      .join(broadcast(cum), Seq(groupCol))
      .where(col("cum") >= ceil(col("q") * col("n_total")))
      .groupBy(col(groupCol), col("q"), col("n_total"))
      .agg(min(struct(col("bin"), col("cum"))).as("first"))
      .select(col(groupCol), col("q"), col("first.bin").as("bin"),
        col("first.cum").as("cum_n"), col("n_total"),
        (lit(lo) + col("first.bin") * lit(width)).as("bin_lo"),
        (lit(lo) + (col("first.bin") + 1) * lit(width)).as("bin_hi"))
  }

  /** PER-GROUP drift report of a batch against the persisted grouped
    * reference — the multi-source monitoring decision ("which SOURCES
    * moved?"): one row per group PRESENT IN THE BATCH with the same
    * exact-integer statistic as [[driftFromSketch]], computed
    * group-by-group. A batch group the reference has never seen reads
    * tvd = 1.0 (an unseen source is maximal drift by definition — the
    * formula's m = 0 case, pinned rather than NaN). Reference-only
    * groups are absent (a source that sent nothing is a volume
    * question, not a shape question — read the rollup for that). */
  def groupedDriftFromSketch(path: String, batch: DataFrame,
                             threshold: Double): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must lie in [0,1]: $threshold")
    val spark = batch.sparkSession
    val (lo, hi, nBins, valueCol, groupCol) = groupedMeta(spark, path)
    val b = groupedBins(batch, groupCol, col(valueCol), lo, hi, nBins)
      .withColumnRenamed("n", "bn")
    val r = readGroupedBins(spark, path).withColumnRenamed("n", "rn")
    val joined = b.join(r, Seq(groupCol, "bin"), "full_outer")
      .na.fill(0L, Seq("bn", "rn"))
    val tot = joined.groupBy(col(groupCol))
      .agg(sum("bn").as("n_batch"), sum("rn").as("m_ref"))
      .where(col("n_batch") > 0) // report batch groups only
    val dec = "decimal(38,0)"
    joined.join(broadcast(tot), Seq(groupCol)) // ≤ |groups|·nBins rows
      .select(col(groupCol),
        (abs(col("bn").cast(dec) * col("m_ref").cast(dec) -
          col("rn").cast(dec) * col("n_batch").cast(dec))).as("term"),
        col("n_batch"), col("m_ref"))
      .groupBy(col(groupCol), col("n_batch"), col("m_ref"))
      .agg(sum("term").as("l1_num"))
      .select(col(groupCol), col("n_batch"), col("m_ref"), col("l1_num"),
        when(col("m_ref") === 0, lit(1.0)).otherwise(
          col("l1_num").cast("double") /
            (lit(2.0) * col("n_batch").cast("double") *
              col("m_ref").cast("double"))).as("tvd"))
      .withColumn("drifted", col("tvd") > threshold)
  }

  /** Distribution-DRIFT check of a new batch against the persisted
    * reference (probe x139) — the monitoring decision every recurring
    * 100 TB ingest needs ("has this source's length/quality/score
    * distribution moved enough to re-version the pipeline?") served
    * off the artifact: the batch pays ONE O(batch) binning pass under
    * the PERSISTED geometry; the reference side is the ≤ nBins merged
    * rows; nothing rescans ingested history.
    *
    * The statistic is total variation distance between the two binned
    * distributions, computed EXACTLY: with batch bins n_b (Σ = N) and
    * reference bins m_b (Σ = M),
    *   l1_num = Σ_b |n_b·M − m_b·N|,   tvd = l1_num / (2·N·M) ∈ [0,1]
    * in decimal(38,0) cross products (exact far past int64 — N·M up
    * to ~10³⁸), so two engines agree on the numerator bit-for-bit;
    * the final quotient is ONE IEEE division of exact integers, which
    * both engines compute identically — never rounded (the
    * pure-per-row-arithmetic stance of the probe rounding rules).
    * Binning error is
    * the geometry contract: drift WITHIN a bin is invisible,
    * resolution (hi−lo)/nBins. Returns ONE row:
    * (n_batch, m_ref, l1_num, tvd, drifted). */
  def driftFromSketch(path: String, batch: DataFrame,
                      threshold: Double): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must lie in [0,1]: $threshold")
    val spark = batch.sparkSession
    val (lo, hi, nBins, valueCol) = sketchMeta(spark, path)
    val b = bins(batch, col(valueCol), lo, hi, nBins)
      .withColumnRenamed("n", "bn")
    val r = readBins(spark, path).withColumnRenamed("n", "rn")
    // full outer on bin: a bin present on one side only still
    // contributes its whole mass to the distance
    val joined = b.join(r, Seq("bin"), "full_outer")
      .na.fill(0L, Seq("bn", "rn"))
    val tot = joined.agg(sum("bn").as("n_batch"), sum("rn").as("m_ref"))
    val dec = "decimal(38,0)"
    joined.crossJoin(broadcast(tot)) // ≤ nBins rows × 1 totals row
      .select((abs(col("bn").cast(dec) * col("m_ref").cast(dec) -
        col("rn").cast(dec) * col("n_batch").cast(dec))).as("term"),
        col("n_batch"), col("m_ref"))
      .groupBy("n_batch", "m_ref")
      .agg(sum("term").as("l1_num"))
      .select(col("n_batch"), col("m_ref"), col("l1_num"),
        // an empty batch (or empty reference) has no distribution to
        // compare: tvd/drifted are null, never a division by zero
        when(col("n_batch") > 0 && col("m_ref") > 0,
          col("l1_num").cast("double") /
            (lit(2.0) * col("n_batch").cast("double") *
              col("m_ref").cast("double"))).as("tvd"))
      .withColumn("drifted", col("tvd") > threshold)
  }

  /** The value threshold at quantile `q`, read off the artifact as a
    * BIN EDGE: the lower edge of the bin containing the ceil(q·N)-th
    * smallest ingested value. Explicit-geometry error: the true
    * quantile lies within that bin, so a curation rule anchored at
    * `bin_lo` over-keeps by at most one bin's mass — the documented
    * trade for a threshold that costs a bounded artifact read instead
    * of an exact-percentile corpus pass (x70's two-phase machinery). */
  def thresholdFromSketch(spark: org.apache.spark.sql.SparkSession,
                          path: String, q: Double): Double = {
    require(q > 0.0 && q <= 1.0, s"q must be in (0, 1]: $q")
    quantilesFromSketch(spark, path, Seq(q))
      .select("bin_lo").head().getDouble(0)
  }

  /** Quantile-threshold CURATION off the artifact (probe x140): keep
    * the rows of `df` whose value column sits at or above the
    * persisted distribution's q-quantile bin edge — "drop the bottom
    * ~q of the corpus by quality" as ONE broadcast-scalar map pass
    * (no stat pass, no sort, no window; the threshold is a literal by
    * the time the filter runs). Rows with null/NaN values are
    * DROPPED, mirroring their exclusion from the sketch itself.
    * A caller that already holds the threshold (e.g. it also reports
    * it, as the daily-decisions flagship does) passes it via
    * `precomputedThr` to skip the second read-off job chain — the
    * value contract is unchanged (the passed threshold must be
    * [[thresholdFromSketch]] of the same artifact and q). */
  def curateByQuantile(df: DataFrame, path: String, q: Double,
                       precomputedThr: Option[Double] = None): DataFrame = {
    val spark = df.sparkSession
    val (_, _, _, valueCol) = sketchMeta(spark, path)
    val thr = precomputedThr.getOrElse(thresholdFromSketch(spark, path, q))
    val v = col(valueCol).cast("double")
    df.where(v.isNotNull && !isnan(v) && v >= lit(thr))
  }

  /** Quantile read-off for the given qs, straight off the artifact:
    * per q, the smallest bin whose cumulative count reaches
    * ceil(q·N), with the bin's geometry — (q, bin, cum_n, n_total,
    * bin_lo, bin_hi). The cumulative window runs over ≤ nBins rows
    * (bounded by construction — this is the one place a window is
    * the right tool). */
  def quantilesFromSketch(spark: org.apache.spark.sql.SparkSession,
                          path: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"qs must be in (0, 1]: $qs")
    import spark.implicits._
    val (lo, hi, nBins, _) = sketchMeta(spark, path)
    val width = (hi - lo) / nBins
    val cum = readBins(spark, path)
      .withColumn("cum", sum("n").over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)))
    val total = cum.agg(max("cum").as("n_total"))
    qs.toDF("q").crossJoin(broadcast(total))
      .join(broadcast(cum),
        col("cum") >= ceil(col("q") * col("n_total")))
      .groupBy("q", "n_total")
      .agg(min(struct(col("bin"), col("cum"))).as("first"))
      .select(col("q"), col("first.bin").as("bin"),
        col("first.cum").as("cum_n"), col("n_total"),
        (lit(lo) + col("first.bin") * lit(width)).as("bin_lo"),
        (lit(lo) + (col("first.bin") + 1) * lit(width)).as("bin_hi"))
  }
}
