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

  test("nearestByValue equals the cross-join lexicographic argmin, incl. ties") {
    import graft.operators.RangeJoin
    // equidistant tie (5.0 between 4.0 and 6.0), duplicate right values
    // (key 12 and 7 both at 6.0 -> 7 wins), exact match, out-of-range ends
    val left = Seq((1L, 5.0), (2L, -100.0), (3L, 999.0), (4L, 6.0), (5L, 4.4))
      .toDF("id", "lv")
    val right = Seq((10L, 4.0), (12L, 6.0), (7L, 6.0), (20L, 50.0))
      .toDF("key", "rv")
    val got = RangeJoin.nearestByValue(left, right, "lv", "rv", "key")
      .select("id", "nearest").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force with struct-lexicographic min_by
    val expect = left.crossJoin(right)
      .groupBy("id")
      .agg(org.apache.spark.sql.functions.expr(
        "min_by(key, struct(abs(rv - lv), key))").as("nearest"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    // equidistant 4.0 vs 6.0 at lv=5.0: |diff| ties, keys {10} vs {12,7} -> 7
    assert(got(1L) === 7L)
    assert(got(2L) === 10L && got(3L) === 20L)  // clamped ends
  }

  test("nearestByValue refuses a fact-sized right side instead of OOMing the driver") {
    val left = Seq((1L, 5.0)).toDF("id", "lv")
    val right = spark.range(50)
      .select(col("id").as("key"), col("id").cast("double").as("rv"))
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.nearestByValue(left, right, "lv", "rv", "key",
        maxRightValues = 10)
    }
    assert(ex.getMessage.contains("more than 10 distinct values"))
    // at or under the cap it still works
    assert(RangeJoin.nearestByValue(left, right, "lv", "rv", "key",
      maxRightValues = 50).count() === 1)
  }

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
