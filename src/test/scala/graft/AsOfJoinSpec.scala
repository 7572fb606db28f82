package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at or before each left time") {
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:05"), 1L),
      ("A", ts("2024-01-01 10:00:30"), 2L),
      ("B", ts("2024-01-01 10:00:10"), 3L),
      ("B", ts("2024-01-01 09:00:00"), 4L)) // before any quote
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:05"), 101.0), // tie with trade 1 → visible
      ("A", ts("2024-01-01 10:00:20"), 102.0),
      ("B", ts("2024-01-01 10:00:00"), 200.0))
      .toDF("sym", "t", "px")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    assert(out(1L) == Some(101.0)) // equal-timestamp quote matches
    assert(out(2L) == Some(102.0))
    assert(out(3L) == Some(200.0))
    assert(out(4L) == None)        // no prior quote → null, row kept
  }

  test("tieBreak: last right row in tie order wins") {
    val l = Seq(("A", ts("2024-01-01 00:00:01"), 1L)).toDF("k", "t", "id")
    val r = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1, "first"),
      ("A", ts("2024-01-01 00:00:00"), 2, "second"))
      .toDF("k", "t", "seq", "v")
    val out = AsOfJoin.asOf(l, r, "k", "t", Seq("v"), tieBreak = Seq("seq"))
      .collect().head.getAs[String]("asof_v")
    assert(out == "second")
  }

  test("plan: one exchange on the key, no range join") {
    val l = Seq(("A", ts("2024-01-01 00:00:01"), 1L)).toDF("k", "t", "id")
    val r = Seq(("A", ts("2024-01-01 00:00:00"), 5.0)).toDF("k", "t", "v")
    val plan = AsOfJoin.asOf(l, r, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a product join:\n$plan")
  }
}
