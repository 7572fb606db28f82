package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Sampling.scoreBuckets (x70): CCNet head/middle/tail tiers via
  * per-group exact percentile thresholds. */
class ScoreBucketsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, java.lang.Double)],
                  head: Double = 0.1, mid: Double = 0.4): Map[Long, String] =
    Sampling.scoreBuckets(
        rows.toDF("doc_id", "lang", "score"), "score", "lang", head, mid)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket"))
      .toMap

  test("fractions land where the percentile thresholds put them") {
    val rows = (1L to 10L).map(i => (i, "en", Double.box(i.toDouble)))
    val got = run(rows)
    // percentile(0.9) over 1..10 = 9.1 → head = {10};
    // percentile(0.5) = 5.5 → middle = {6,7,8,9}; tail = {1..5}
    assert(got.filter(_._2 == "head").keySet === Set(10L))
    assert(got.filter(_._2 == "middle").keySet === Set(6L, 7L, 8L, 9L))
    assert(got.filter(_._2 == "tail").keySet === (1L to 5L).toSet)
  }

  test("groups bucket independently; nulls and ties behave") {
    val rows = (1L to 10L).map(i => (i, "en", Double.box(i.toDouble))) ++
      Seq((11L, "fr", Double.box(100.0)), (12L, "fr", Double.box(200.0)),
        (13L, "en", null: java.lang.Double),
        (14L, "de", Double.box(7.0)), (15L, "de", Double.box(7.0)))
    val got = run(rows)
    // fr thresholds come only from fr scores: 200 is fr's head
    assert(got(12L) === "head")
    assert(got(11L) != "head")
    // null score → tail, and it does not perturb en's thresholds
    assert(got(13L) === "tail")
    assert(got.filter(t => t._2 == "head" && t._1 <= 10L).keySet === Set(10L))
    // all-tied group: every row >= its own percentile → all head
    assert(got(14L) === "head" && got(15L) === "head")
  }

  test("plan: no unbounded aggregate buffer, windows only over bounded inputs") {
    val df = Sampling.scoreBuckets(
      (1L to 100L).map(i => (i, s"l${i % 3}", i.toDouble))
        .toDF("doc_id", "lang", "score"), "score", "lang")
    val phys = df.queryExecution.executedPlan.toString
    // the O(group-size)-buffer exact Percentile aggregate must be gone
    assert(!phys.toLowerCase.contains("percentile"), phys)
    assert(phys.contains("BroadcastHashJoin") || phys.contains("BroadcastExchange"), phys)
    // any window sits over a bounded input: either above a keyed
    // aggregation (≤ groups × numBuckets rows) or above the broadcast
    // needed-cell semi-filter (~1/numBuckets of each group) — never
    // directly over the raw corpus (checked on the optimized logical
    // plan, which AQE leaves visible)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "expected the two bounded windows of the two-phase design")
    windows.foreach { w =>
      val sub = w.child.toString
      assert(sub.contains("Aggregate") || sub.contains("Join"), sub)
    }
  }

  test("groupPercentilesExact is bit-identical to the built-in exact percentile") {
    val rnd = new scala.util.Random(7)
    // ties, skew (half the mass on one value), small + large groups
    val rows = (1 to 2000).map { i =>
      val g = s"g${i % 5}"
      val v = if (rnd.nextBoolean()) 42.0 else rnd.nextInt(50) + rnd.nextDouble()
      (g, v)
    } ++ Seq(("solo", 3.25), ("pair", 1.0), ("pair", 2.0))
    val df = rows.toDF("g", "s")
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.97, 1.0)
    val got = Sampling.groupPercentilesExact(df, "s", "g", ps, numBuckets = 16)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val want = df.groupBy("g")
      .agg(expr(s"percentile(s, array(${ps.mkString(",")}))").as("q"))
      .collect().flatMap { r =>
        r.getSeq[Double](1).zipWithIndex.map { case (q, i) => (r.getString(0), i) -> q }
      }.toMap
    assert(got.keySet === want.keySet)
    for (k <- want.keySet)
      assert(java.lang.Double.doubleToLongBits(got(k)) ===
        java.lang.Double.doubleToLongBits(want(k)), s"$k: got ${got(k)} want ${want(k)}")
  }

  test("groupPercentilesExact: nulls ignored, all-null group absent") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
        ("b", None)).toDF("g", "s")
    val got = Sampling.groupPercentilesExact(df, "s", "g", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got === Map("a" -> 2.0))
  }
}
