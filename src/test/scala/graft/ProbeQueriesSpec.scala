package graft

import org.apache.spark.sql.functions._

import graft.operators.ProbeQueries

/** Smoke + invariants for every declared probe (the sf0.01 hash-match
  * against DuckDB is done by tools/check.py / the driver; these specs
  * assert structural invariants cheaply at sf0.001). */
class ProbeQueriesSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every probe has an oracle") {
    val missing = ProbeQueries.probes.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"probes without oracle SQL: $missing")
  }

  for (p <- ProbeQueries.probes) {
    test(s"${p.name} runs and returns rows") {
      val df = p.query(spark, sfDir)
      assert(df.count() > 0)
    }
  }

  test("q05 fractions are probabilities") {
    val rows = ProbeQueries.queryMap("q05_cond_prob")(spark, sfDir)
      .select("frac").collect().map(_.getDouble(0))
    assert(rows.forall(f => f >= 0.0 && f <= 1.0))
  }

  test("q10 dedup yields one row per customer key") {
    val df = ProbeQueries.queryMap("q10_dedup_keepmax")(spark, sfDir)
    assert(df.count() == df.select("o_custkey").distinct().count())
  }

  test("q11 ntile buckets within 1..5") {
    val nt = ProbeQueries.queryMap("q11_ntile")(spark, sfDir)
      .select("nt").distinct().collect().map(_.getInt(0)).sorted
    assert(nt.head >= 1 && nt.last <= 5)
  }

  test("q23 rollup contains the grand-total row") {
    val df = ProbeQueries.queryMap("q23_rollup")(spark, sfDir)
    val total = df.where(col("n_regionkey").isNull && col("n_nationkey").isNull)
      .select("n").collect()
    assert(total.length == 1 && total.head.getLong(0) == 25L)
  }

  test("q27 similarities are valid cosines in descending order") {
    val sims = ProbeQueries.queryMap("q27_cosine_topk")(spark, sfDir)
      .select("sim").collect().map(_.getDouble(0))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sameElements(sims.sorted.reverse))
  }
}
