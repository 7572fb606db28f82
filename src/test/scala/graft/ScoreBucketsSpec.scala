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

  test("plan: one grouped aggregation + broadcast join, no window over the corpus") {
    val df = Sampling.scoreBuckets(
      (1L to 100L).map(i => (i, s"l${i % 3}", i.toDouble))
        .toDF("doc_id", "lang", "score"), "score", "lang")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }
}
