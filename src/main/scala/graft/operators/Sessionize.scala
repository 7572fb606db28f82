package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the gap to the
  * previous event exceeds `gapMinutes`. The classic cumulative-sum-of-
  * boundaries window trick — one shuffle on the user key, no state
  * store needed in batch (the streaming twin is
  * `session_window`/`flatMapGroupsWithState`).
  */
object Sessionize {

  def assign(events: DataFrame, gapMinutes: Int,
             userCol: String = "user_id", timeCol: String = "ts",
             tieBreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(timeCol, tieBreak)
    val gapSec = gapMinutes * 60L
    events
      .withColumn("__prev", lag(col(timeCol), 1).over(w))
      .withColumn("__boundary",
        when(col("__prev").isNull, 1)
          .when(unix_timestamp(col(timeCol)) - unix_timestamp(col("__prev")) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum("__boundary").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("session_id",
        concat(col(userCol).cast("string"), lit("_"), col("session_idx").cast("string")))
      .drop("__prev", "__boundary")
  }

  /** Per-session summary: bounds, duration, event count. */
  def summarize(sessions: DataFrame, userCol: String = "user_id",
                timeCol: String = "ts"): DataFrame =
    sessions.groupBy(userCol, "session_id")
      .agg(min(timeCol).as("session_start"), max(timeCol).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(timeCol)) - unix_timestamp(min(timeCol))).as("duration_sec"))
}
