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

  /** Keep ~fraction of rows, decided by an md5 hash of the id —
    * deterministic on any engine/cluster, no RNG. */
  def deterministicSample(df: DataFrame, fraction: Double,
                          idCol: String = "doc_id"): DataFrame = {
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 7), 16, 10)
      .cast("long") % 1000000L
    df.where(bucket < (fraction * 1000000L).toLong)
  }
}
