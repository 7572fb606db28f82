package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points `v` against intervals `[lo, hi)`.
  *
  * The naive plan for a theta join is a nested-loop product — at
  * 100 TB, quadratic. Bucketizing turns it into an ordinary shuffle
  * equi-join: every point maps to bucket `floor(v/width)`, every
  * interval explodes to the buckets it overlaps, the join keys on the
  * bucket, and the exact predicate filters inside the bucket. Interval
  * fan-out is bounded by `(hi - lo)/width + 2`, so `width` around the
  * median interval length keeps the blow-up ~2× while confining the
  * quadratic behavior to single buckets (the same containment idea as
  * LSH banding).
  */
object RangeJoin {

  /** Equi-join plan for `points.v in [intervals.lo, intervals.hi)`.
    * Output: all (point, interval) matches with both sides' columns.
    * `points` and `intervals` must not share column names. */
  def bucketized(points: DataFrame, valueCol: String,
                 intervals: DataFrame, loCol: String, hiCol: String,
                 width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    def bucketOf(c: Column): Column = floor(c / width).cast("long")
    val pts = points.withColumn("__bucket", bucketOf(col(valueCol)))
    // sequence is inclusive: the hi-boundary bucket row is superfluous
    // when hi sits exactly on a boundary, but only adds filter misses
    val ivs = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    pts.join(ivs, Seq("__bucket"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
