package graft

import org.apache.spark.sql.functions._

import graft.impact.DamageProbability

class DamageProbabilitySpec extends SparkTestBase {
  import spark.implicits._

  private val impact = Seq(
    ("M1", 0, 100.0), ("M1", 1, 200.0), ("M1", 2, 300.0), ("M1", 3, 400.0),
    ("M2", 0, 0.0), ("M2", 1, 0.0), ("M2", 2, 50.0), ("M2", 3, 1000.0))
    .toDF("Mun_Code", "ens_id", "damage_num")

  test("A11 percentile + whole-percent threshold probability") {
    val got = DamageProbability.municipalityTable(impact, percentile = 0.5, threshold = 150.0)
      .orderBy("Mun_Code").collect()
    // M1: quantile(0.5) of [100,200,300,400] = 250; P(>=150) = 3/4 → 75
    assert(got(0).getAs[Double]("damage_at_percentile") == 250.0)
    assert(got(0).getAs[Double]("prob_over_threshold_pct") == 75.0)
    // M2: P(>=150) = 1/4 → 25
    assert(got(1).getAs[Double]("prob_over_threshold_pct") == 25.0)
  }

  test("A12 rollup appends the TOTAL row") {
    val perMun = impact.groupBy("Mun_Code").agg(sum("damage_num").as("dmg"))
    val got = DamageProbability.withTotalRow(perMun, Seq("dmg"))
      .orderBy("Mun_Code").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("M1" -> 1000.0, "M2" -> 1050.0, "TOTAL" -> 2050.0))
  }

  test("W9 priority index: quintiles on non-null, null passthrough") {
    val perMun = Seq(("A", Some(10.0)), ("B", Some(20.0)), ("C", Some(30.0)),
      ("D", Some(40.0)), ("E", Some(50.0)), ("F", Option.empty[Double]))
      .toDF("Mun_Code", "impact")
    val got = DamageProbability.priorityIndex(perMun, "impact")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(got("A") == Some(1) && got("E") == Some(5))
    assert(got("F") == None)
  }
}
