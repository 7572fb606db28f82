package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale utilities (SURVEY.md §4 / the 100 TB design goals): skew
  * salting and bucketed co-located joins. AQE's skew-join handling
  * covers most cases at runtime; explicit salting is for the
  * pathological keys AQE cannot split (e.g. one storm_id carrying half
  * the rows after an explode).
  */
object Scale {

  /** Equi-join `left ⋈ right` on `keys` with the left side's skew
    * spread over `saltFactor` sub-keys. The right side is replicated
    * once per salt value (explode of a literal range — cheap when the
    * right side is the smaller input). Semantics identical to the
    * plain inner join. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Write a DataFrame bucketed+sorted by join keys: two tables
    * bucketed identically join WITHOUT a shuffle (no Exchange in the
    * plan) — the co-located join strategy for repeated large joins.
    * Requires a catalog table (bucket metadata lives in the metastore). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
