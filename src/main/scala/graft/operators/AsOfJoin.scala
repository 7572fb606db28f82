package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join (point-in-time lookup): for every left row, the most
  * recent right row with the same key and `right.time <= left.time`
  * — the "last known quote for each trade" / "latest forecast cycle
  * for each event" primitive.
  *
  * Implemented as UNION + window forward-fill, NOT as a range join:
  * tag both inputs, union them, sort each key partition by (time,
  * side) with right rows before left rows at equal timestamps (so a
  * right row AT the left row's timestamp is visible to it), forward-
  * fill the right payload with `last(ignoreNulls)`, keep the left
  * rows. One shuffle on the key, O(n log n) per partition — a range
  * join would be O(n·m) per key, the classic scale trap for this
  * operation.
  */
object AsOfJoin {

  /** `payloadCols` are carried from the right side (null when no right
    * row precedes the left row, like a left join). `tieBreak` orders
    * multiple right rows sharing (key, time) — the LAST one in that
    * order wins. Output = all left columns + `asof_<payload>` columns. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
           payloadCols: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val paySchema = StructType(right.select(payloadCols.map(col): _*).schema.fields)
    def tieStruct(fromRight: Boolean) =
      if (tieBreak.isEmpty) lit(0).as("__tie")
      else if (fromRight) struct(tieBreak.map(col): _*).as("__tie")
      else lit(null).cast(
        StructType(right.select(tieBreak.map(col): _*).schema.fields)).as("__tie")
    val l = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__left"),
      lit(null).cast(paySchema).as("__payload"),
      tieStruct(fromRight = false))
    val r = right.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(0).as("__side"),
      lit(null).cast(StructType(left.schema.fields)).as("__left"),
      struct(payloadCols.map(col): _*).as("__payload"),
      tieStruct(fromRight = true))
    val order: Seq[org.apache.spark.sql.Column] =
      Seq(col("__t"), col("__side")) ++
        (if (tieBreak.isEmpty) Nil else tieBreak.map(c => col(s"__tie.$c")))
    val w = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__filled", last("__payload", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__left.$c").as(c)) ++
        payloadCols.map(c => col(s"__filled.$c").as(s"asof_$c")): _*)
  }
}
