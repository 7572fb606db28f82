package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build/append-time per-cell assignment statistics for the at-rest
  * ANN indexes (int8 IVF, IVF-PQ) and the STALENESS signal derived
  * from them.
  *
  * The append paths deliberately assign against the index's PERSISTED
  * centroids (the versioned-quantizer contract — retraining would
  * re-home every existing code partition), which leaves an
  * operational gap: after heavy DRIFTED ingest, cell balance and
  * recall degrade silently, because every new vector still lands in
  * its nearest *stale* cell. This object closes the gap without ever
  * re-reading the corpus:
  *
  *  - at build, the per-cell (count, Σ within-cell distance) of the
  *    build corpus persists next to the index (`$path/stats`,
  *    ≤ nlist rows);
  *  - each append writes the SAME bounded stats for its batch in the
  *    assignment pass it already pays (O(batch), one broadcast join
  *    + one agg, output ≤ nlist rows);
  *  - [[staleness]] aggregates the stats table (bounded:
  *    cells × appends rows — never the codes) and compares the
  *    appended traffic against the build baseline.
  *
  * REBUILD TRIGGER (the documented "when to re-version" answer): when
  * [[Staleness.stale]] is set — the appended vectors sit materially
  * farther from their assigned centroids than the build corpus did
  * (`appendDistRatio > distRatioMax` with a non-trivial appended
  * share), or cell balance degraded (`skewRatio > skewRatioMax`) —
  * re-version the quantizer: rebuild with `Similarity.writeInt8Index`
  * / `PqIndex.writeIndex` over the current corpus, which re-trains
  * centroids, re-homes codes, and resets the baseline; appends then
  * resume against the new version. Stationary ingest never trips
  * either signal (spec-pinned), so the trigger fires on drift, not on
  * growth.
  */
object IndexStats {

  /** Per-cell (n, Σ round-6 sq-dist) of `assigned` rows against their
    * OWN cell's centroid — one nlist-row broadcast join + one bounded
    * agg; `assigned` is the (id, vec, cell) shape `IvfIndex.assign`
    * returns, so no corpus × nlist pass happens here. */
  private def cellStats(assigned: DataFrame, cents: DataFrame,
                        vecCol: String): DataFrame =
    assigned.join(broadcast(cents), "cell")
      .withColumn("_d", IvfIndex.sqDist(col(vecCol), col("centroid")))
      // cell normalizes to long: build-side frames may carry it as an
      // inferred int partition column while append-side frames carry
      // the assignment's long — mixed physical types in one stats dir
      // would fail the read
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n"), sum(col("_d")).as("sum_dist"))

  /** Persist the build corpus's per-cell baseline (overwrite —
    * a rebuild resets the baseline). */
  def writeBuildStats(assigned: DataFrame, cents: DataFrame, path: String,
                      vecCol: String = "embedding"): Unit =
    cellStats(assigned, cents, vecCol)
      .withColumn("phase", lit("build"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")

  /** Persist one append batch's per-cell stats (append — each ingest
    * adds ≤ nlist rows; the codes are never read). */
  def appendBatchStats(assigned: DataFrame, cents: DataFrame, path: String,
                       vecCol: String = "embedding"): Unit =
    cellStats(assigned, cents, vecCol)
      .withColumn("phase", lit("append"))
      .coalesce(1).write.mode("append").parquet(s"$path/stats")

  /** The staleness readout. `appendDistRatio` compares the APPENDED
    * traffic's mean within-cell distance against the build baseline
    * (the sharp drift signal — overall means move too slowly while
    * the appended share is small); `skewRatio` compares current
    * max-cell-share imbalance against build-time imbalance. */
  final case class Staleness(nBuild: Long, nAppended: Long,
                             appendShare: Double,
                             meanDistBuild: Double, meanDistAppend: Double,
                             appendDistRatio: Double,
                             skewBuild: Double, skewNow: Double,
                             skewRatio: Double,
                             stale: Boolean)

  /** Read the bounded stats table and derive the staleness signal.
    * Never touches codes/vectors; the heaviest input is
    * cells × (1 + appends) rows, rolled up to ≤ 2·nlist before
    * collect. Thresholds: drift fires when the appended share is at
    * least `minAppendShare` AND appended vectors sit
    * `distRatioMax`× farther from their centroids than the build
    * corpus did; balance fires when max-cell skew grew
    * `skewRatioMax`× over the build baseline. */
  def staleness(spark: SparkSession, path: String,
                distRatioMax: Double = 1.5,
                skewRatioMax: Double = 2.0,
                minAppendShare: Double = 0.05): Staleness = {
    val rows = spark.read.parquet(s"$path/stats")
      .groupBy("cell", "phase")
      .agg(sum("n").as("n"), sum("sum_dist").as("s"))
      .collect()
      .map(r => (r.getAs[Number]("cell").intValue(), r.getAs[String]("phase"),
        r.getAs[Long]("n"), r.getAs[Double]("s")))
    val build = rows.filter(_._2 == "build")
    require(build.nonEmpty,
      s"no build-time stats under $path/stats — the index predates the " +
        "staleness machinery; rebuild it (writeInt8Index / " +
        "PqIndex.writeIndex) to establish a baseline")
    val appended = rows.filter(_._2 == "append")
    val nBuild = build.map(_._3).sum
    val nApp = appended.map(_._3).sum
    val share = if (nBuild + nApp == 0) 0.0
                else nApp.toDouble / (nBuild + nApp)
    val meanB = if (nBuild == 0) 0.0 else build.map(_._4).sum / nBuild
    val meanA = if (nApp == 0) 0.0 else appended.map(_._4).sum / nApp
    val distRatio =
      if (nApp == 0) 1.0
      else if (meanB <= 0.0) { if (meanA > 0.0) Double.PositiveInfinity else 1.0 }
      else meanA / meanB
    // skew over the cells the BUILD populated (the quantizer's working
    // set); a drifted append funneling into few cells raises maxNow
    val cells = build.map(_._1).distinct.length.toDouble
    val totalByCell = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    def skew(maxN: Long, total: Long): Double =
      if (total == 0 || cells == 0) 1.0 else maxN / (total / cells)
    val skewB = skew(build.map(_._3).max, nBuild)
    val skewN = skew(totalByCell.values.max, nBuild + nApp)
    val skewRatio = if (skewB <= 0.0) 1.0 else skewN / skewB
    val stale = (share >= minAppendShare && distRatio > distRatioMax) ||
      skewRatio > skewRatioMax
    Staleness(nBuild, nApp, share, meanB, meanA, distRatio,
      skewB, skewN, skewRatio, stale)
  }
}
