package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketized range join: identical matches to the naive theta join,
  * boundary semantics [lo, hi), and an equi-join physical plan. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val points = Seq(0.0, 9.99, 10.0, 15.5, 20.0, 39.9, 40.0, 55.0)
    .map(Tuple1(_)).toDF("v")
  private lazy val intervals = Seq(
    ("a", 0.0, 10.0), ("b", 5.0, 25.0), ("c", 20.0, 20.0), // empty interval c
    ("d", 39.9, 40.1), ("e", 50.0, 60.0))
    .toDF("name", "lo", "hi")

  test("matches equal the naive theta join for every bucket width") {
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("name", "v").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    for (w <- Seq(0.5, 3.0, 10.0, 100.0)) {
      val got = RangeJoin.bucketized(points, "v", intervals, "lo", "hi", w)
        .select("name", "v").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got === naive, s"width $w")
    }
    // boundary semantics: 10.0 not in [0,10); empty interval matches nothing
    assert(!naive.contains(("a", 10.0)) && !naive.exists(_._1 == "c"))
    assert(naive.contains(("d", 39.9)) && naive.contains(("d", 40.0)))
  }

  test("physical plan is an equi-join on the bucket, not a product") {
    val p = RangeJoin.bucketized(points, "v", intervals, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must bucket-equi-join:\n$p")
  }
}
