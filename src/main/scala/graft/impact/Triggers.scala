package graft.impact

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ensemble-probability trigger evaluation (SURVEY.md §2.5 A3–A6,
  * reference forecast_process.py:1239-1502 + settings.py:58-145).
  *
  * All trigger checks share one relational shape:
  *   1. W6 dedup (keep max damage per (Mun_Code, ens_id)),
  *   2. per-ensemble-member totals (A5),
  *   3. for each (threshold, prob) pair: P(total > threshold) over
  *      members, compared against prob (A6).
  * Step 3 is computed with ONE aggregation by cross-joining the tiny
  * threshold table against the per-member totals — no driver-side loop
  * over thresholds, no repeated scans (the reference loops in Python;
  * at scale one shuffle beats 5).
  *
  * Expected input columns: Mun_Code: string, ens_id: int,
  * damage_pct: double (predicted % damaged), damage_num: double
  * (predicted damaged buildings).
  */
object Triggers {

  /** Threshold tables from the reference settings.py (public repo). */
  val DrefProbabilities: Seq[(String, Double, Double)] = Seq(
    ("80k", 80000, 0.5), ("50k", 50000, 0.6), ("10k", 10000, 0.8), ("5k", 5000, 0.95))
  val CerfProbabilities: Seq[(String, Double, Double)] = Seq(
    ("80k", 80000, 0.5), ("50k", 50000, 0.6), ("30k", 30000, 0.7),
    ("10k", 10000, 0.8), ("5k", 5000, 0.95))
  /** province pcode → (label, threshold, prob) */
  val StartProbabilities: Map[String, Seq[(String, Double, Double)]] = Map(
    "PH166700000" -> Seq(("8k", 8000, 0.8), ("17k", 17000, 0.8), ("25k", 25000, 0.7),
      ("34k", 34000, 0.5), ("37k", 37000, 0.5)),
    "PH021500000" -> Seq(("35k", 35000, 0.8), ("49k", 49000, 0.8), ("55k", 55000, 0.7),
      ("59k", 59000, 0.5), ("62k", 62000, 0.5)),
    "PH082600000" -> Seq(("23k", 23000, 0.8), ("42k", 42000, 0.8), ("53k", 53000, 0.7),
      ("64k", 64000, 0.5), ("70k", 70000, 0.5)))
  val HiProbabilities: Map[String, Seq[(String, Double, Double)]] = Map(
    "PH050500000" -> Seq(("15k", 15000, 0.8), ("24.5k", 24500, 0.7), ("36k", 36000, 0.5)))
  val CerfRegions = Seq("PH05", "PH08", "PH16")

  /** W6: keep the max-damage row per (Mun_Code, ens_id) —
    * deterministic version of the reference's sort+drop_duplicates
    * (which is keep-last-after-sort, i.e. order-dependent). Extra
    * tie-break columns make exact-damage ties deterministic too. */
  def dedupKeepMax(impact: DataFrame, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy("Mun_Code", "ens_id")
      .orderBy(col("damage_pct").desc +: tieBreak.map(col): _*)
    impact.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  /** A5: per-member totals: municipality count, total damaged
    * buildings, count of triggered municipalities (damage_pct > 10). */
  def ensembleTotals(impact: DataFrame): DataFrame =
    dedupKeepMax(impact)
      .groupBy("ens_id")
      .agg(
        count(lit(1)).as("n_municipalities"),
        sum("damage_num").as("total_buildings"),
        sum(when(col("damage_pct") > 10, 1).otherwise(0)).as("n_triggered"))

  /** A6: exceedance-probability table — one aggregation for ALL
    * thresholds via a broadcast cross join with the threshold list. */
  def exceedanceTable(perMemberTotals: DataFrame, totalCol: String,
                      thresholds: Seq[(String, Double, Double)]): DataFrame = {
    val spark = perMemberTotals.sparkSession
    import spark.implicits._
    val thr = thresholds.toDF("threshold_label", "threshold", "prob_threshold")
    perMemberTotals.crossJoin(broadcast(thr))
      .groupBy("threshold_label", "threshold", "prob_threshold")
      .agg(avg(when(col(totalCol) > col("threshold"), 1.0).otherwise(0.0))
        .as("predicted_probability"))
      .withColumn("triggered", col("predicted_probability") > col("prob_threshold"))
  }

  /** DREF check (forecast_process.py:1282-1400): returns
    * (threshold_label, scenario, triggered) rows for the 10%-damage
    * rule at member-probability 50/70/90 plus the 'Average' scenario
    * (mean damage > 10% in ≥3 municipalities). */
  def drefTrigger(impact: DataFrame): DataFrame = {
    val spark = impact.sparkSession
    import spark.implicits._
    val deduped = dedupKeepMax(impact).cache()
    val perMember = deduped.groupBy("ens_id")
      .agg(sum(when(col("damage_pct") > 10, 1).otherwise(0)).as("n_trig"))
      .withColumn("trig3x10", when(col("n_trig") > 2, 1.0).otherwise(0.0))
    val pct = perMember.agg((avg("trig3x10") * 100).as("p")).as[Double].head()
    val avgTrig = deduped.groupBy("Mun_Code")
      .agg(avg("damage_pct").as("avg_dmg"))
      .agg(sum(when(col("avg_dmg") > 10, 1).otherwise(0)).as("n"))
      .as[Long].head() > 2
    deduped.unpersist()
    val rows = Seq(("50", "Moderate", pct > 50), ("70", "High", pct > 70),
      ("90", "Very High", pct > 90), ("Average", "NA", avgTrig))
    rows.toDF("threshold_label", "scenario", "triggered")
  }

  /** CERF check (forecast_process.py:1239-1278): regions PH05/08/16
    * only, per-member damaged-building totals vs the CERF table. */
  def cerfTrigger(impact: DataFrame): DataFrame = {
    val filtered = dedupKeepMax(impact)
      .where(substring(col("Mun_Code"), 1, 4).isin(CerfRegions: _*))
    val perMember = filtered.groupBy("ens_id").agg(sum("damage_num").as("total"))
    exceedanceTable(perMember, "total", CerfProbabilities)
  }

  /** START/HI checks (forecast_process.py:1404-1502): per-province
    * (Mun_Code[:6] + "00000") member totals vs province-specific
    * tables. Returns rows tagged with the province pcode. */
  def provincialTrigger(impact: DataFrame,
                        tables: Map[String, Seq[(String, Double, Double)]]): DataFrame = {
    val spark = impact.sparkSession
    import spark.implicits._
    val thr = tables.toSeq.flatMap { case (prov, rows) =>
      rows.map { case (l, t, p) => (prov, l, t, p) }
    }.toDF("province", "threshold_label", "threshold", "prob_threshold")
    val perMember = dedupKeepMax(impact)
      .withColumn("province", concat(substring(col("Mun_Code"), 1, 6), lit("00000")))
      .groupBy("province", "ens_id")
      .agg(sum("damage_num").as("total"))
    perMember.join(broadcast(thr), Seq("province"))
      .groupBy("province", "threshold_label", "threshold", "prob_threshold")
      .agg(avg(when(col("total") > col("threshold"), 1.0).otherwise(0.0))
        .as("predicted_probability"))
      .withColumn("triggered", col("predicted_probability") > col("prob_threshold"))
  }

  def startTrigger(impact: DataFrame): DataFrame = provincialTrigger(impact, StartProbabilities)
  def hiTrigger(impact: DataFrame): DataFrame    = provincialTrigger(impact, HiProbabilities)
}
