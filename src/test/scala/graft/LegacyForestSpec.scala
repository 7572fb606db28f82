package graft

import org.apache.spark.sql.functions._

import graft.impact.LegacyForest

/** X10 legacy ranger-path twin: the run_prediction_model.R dataflow
  * (classification threshold + continuous impact + ntile_na priority,
  * joined per municipality). No artifact exists to match numerically —
  * asserted here: contract columns, prediction ranges, the NA-passthrough
  * quintile, and signal recovery on a separable synthetic corpus. */
class LegacyForestSpec extends SparkTestBase {
  import spark.implicits._

  private val features = Seq("WEA_dist_track", "HAZ_v_max", "VUL_housing")

  // 120 municipalities: close+windy ones are damaged, far ones are not
  private lazy val frame = (0 until 120).map { i =>
    val dist = (i % 40) * 10.0          // 0..390 km
    val vmax = 70.0 - (i % 40) * 1.5    // strong when close
    val dmg = math.max(0.0, (50.0 - dist) * 1.2)
    (f"PH$i%09d", dist, vmax, 1000.0 + i, if (dmg > 10) 1.0 else 0.0, dmg)
  }.toDF("GEN_mun_code", "WEA_dist_track", "HAZ_v_max", "VUL_housing",
    "impact_threshold_passed_label", "DAM_perc_dmg")

  test("predictImpact returns the R contract columns, one row per municipality") {
    val models = LegacyForest.train(frame, features, numTrees = 20)
    val out = LegacyForest.predictImpact(models, frame).cache()
    assert(out.columns.toSeq === Seq("GEN_mun_code", "impact_threshold_passed",
      "WEA_dist_track", "impact", "priority_index"))
    assert(out.count() === 120)
    assert(out.select("GEN_mun_code").distinct().count() === 120)
    // classification output is binary; quintiles land in 1..5 (or null)
    assert(out.where(!col("impact_threshold_passed").isin(0.0, 1.0)).count() === 0)
    assert(out.where(col("priority_index").isNotNull &&
      (col("priority_index") < 1 || col("priority_index") > 5)).count() === 0)
    // the forests learn the separable signal: near+windy → triggered
    val near = out.where(col("WEA_dist_track") <= 30)
    assert(near.where(col("impact_threshold_passed") === 1.0).count() === near.count())
    assert(out.where(col("WEA_dist_track") >= 200 &&
      col("impact_threshold_passed") === 1.0).count() === 0)
    out.unpersist()
  }

  test("ntile_na: negative continuous predictions get a null priority index") {
    // force negatives through the ntile by applying the rule directly
    val scored = Seq(("A", -5.0), ("B", 1.0), ("C", 2.0), ("D", 3.0),
      ("E", 4.0), ("F", 5.0)).toDF("Mun_Code", "impact")
      .withColumn("impact",
        when(col("impact") < 0, lit(null).cast("double")).otherwise(col("impact")))
    val ranked = graft.impact.DamageProbability.priorityIndex(scored, "impact")
    val m = ranked.collect().map(r => r.getString(0) ->
      (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(m("A") === None)
    assert(Seq("B", "C", "D", "E", "F").flatMap(m(_)).sorted === Seq(1, 2, 3, 4, 5))
  }
}
