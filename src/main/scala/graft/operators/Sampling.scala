package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation sampling.
  *
  * `stratifiedByDecile`: bucket rows into quality deciles (ntile over
  * the score) and keep a per-decile fraction — the usual
  * quality-weighted downsampling of web corpora. Seeded `sampleBy`
  * keeps it reproducible on a fixed cluster; for cross-engine
  * reproducibility use `deterministicSample`, which hashes the id
  * (md5-derived, engine-portable) instead of drawing randoms.
  */
object Sampling {

  def stratifiedByDecile(df: DataFrame, scoreCol: String,
                         fractions: Map[Int, Double], seed: Long = 42,
                         tieBreak: String = "doc_id"): DataFrame = {
    val bucketed = df.withColumn("decile",
      ntile(10).over(Window.orderBy(col(scoreCol), col(tieBreak))))
    val fr: Map[Any, Double] =
      (1 to 10).map(d => (d: Any) -> fractions.getOrElse(d, 0.0)).toMap
    bucketed.stat.sampleBy("decile", fr, seed)
  }

  /** Keep rows whose metric lies inside the per-group quantile band
    * [lo, hi] — the outlier-trimming filter of corpus curation ("drop
    * the shortest 10% and longest 10% per source"). Exact percentiles
    * via one grouped aggregation joined back; at scale the bounds
    * table is group-cardinality-sized and broadcasts. */
  def quantileBandFilter(df: DataFrame, metricCol: String, groupCol: String,
                         lo: Double, hi: Double): DataFrame = {
    val bounds = df.groupBy(groupCol).agg(
      expr(s"percentile($metricCol, $lo)").as("q_lo"),
      expr(s"percentile($metricCol, $hi)").as("q_hi"))
    df.join(bounds, Seq(groupCol))
      .where(col(metricCol) >= col("q_lo") && col(metricCol) <= col("q_hi"))
  }

  /** Keep ~fraction of rows, decided by an md5 hash of the id —
    * deterministic on any engine/cluster, no RNG. */
  def deterministicSample(df: DataFrame, fraction: Double,
                          idCol: String = "doc_id"): DataFrame = {
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 7), 16, 10)
      .cast("long") % 1000000L
    df.where(bucket < (fraction * 1000000L).toLong)
  }
}
