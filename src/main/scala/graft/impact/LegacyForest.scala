package graft.impact

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X10 — the legacy R ranger prediction path
  * (lib_r/run_prediction_model.R:1-32), re-expressed with MLlib random
  * forests. The reference marks this path non-operational and ships NO
  * ranger artifact (models/operational holds only the xgboost RDS
  * files, which [[XgbBooster]] scores exactly), so unlike X9 there is
  * nothing to be numerically identical to; what this twin reproduces
  * is the dataflow, exactly:
  *
  *   1. a CLASSIFICATION forest scores `impact_threshold_passed`
  *      (run_prediction_model.R:8-15),
  *   2. a CONTINUOUS forest scores `impact`, and
  *      `priority_index = ntile_na(impact < 0 → NA, 5)` — the quintile
  *      with NA passthrough defined at xgb_model_v1.R:40-45
  *      (run_prediction_model.R:18-26),
  *   3. the two predictions are joined per municipality with
  *      `WEA_dist_track` carried from the feature frame
  *      (run_prediction_model.R:28).
  *
  * Forest defaults mirror ranger's: 500 trees, mtry = √p for
  * classification and p/3 for regression, unlimited depth (MLlib caps
  * at 30). Scoring is a per-row map — embarrassingly parallel; the
  * ntile is one narrow window over municipalities (W9, same operator
  * as DamageProbability.priorityIndex).
  */
object LegacyForest {

  final case class Models(classification: RandomForestClassificationModel,
                          continuous: RandomForestRegressionModel,
                          features: Seq[String])

  private def assemble(df: DataFrame, features: Seq[String]) =
    new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .setHandleInvalid("keep")
      .transform(df)

  /** Train both forests (ranger-default shaped). `thresholdLabel` is
    * the binary impact-threshold label, `impactLabel` the continuous
    * damage label. */
  def train(trainDf: DataFrame, features: Seq[String],
            thresholdLabel: String = "impact_threshold_passed_label",
            impactLabel: String = "DAM_perc_dmg", numTrees: Int = 500,
            seed: Long = 42): Models = {
    val assembled = assemble(trainDf, features).cache()
    val cls = new RandomForestClassifier()
      .setLabelCol(thresholdLabel).setFeaturesCol("features")
      .setNumTrees(numTrees).setFeatureSubsetStrategy("sqrt")
      .setMaxDepth(30).setSeed(seed)
      .fit(assembled)
    val reg = new RandomForestRegressor()
      .setLabelCol(impactLabel).setFeaturesCol("features")
      .setNumTrees(numTrees).setFeatureSubsetStrategy("onethird")
      .setMaxDepth(30).setSeed(seed)
      .fit(assembled)
    assembled.unpersist()
    Models(cls, reg, features)
  }

  /** The run_prediction_model dataflow: both forests over the feature
    * frame, joined per municipality. Output columns match the R
    * return: (GEN_mun_code, impact_threshold_passed, WEA_dist_track,
    * impact, priority_index). */
  def predictImpact(models: Models, data: DataFrame,
                    munCol: String = "GEN_mun_code",
                    distCol: String = "WEA_dist_track"): DataFrame = {
    val assembled = assemble(data, models.features)
    val classified = models.classification.transform(assembled)
      .select(col(munCol), col("prediction").as("impact_threshold_passed"),
        col(distCol))
    val continuous = models.continuous.transform(
        assembled.drop("prediction", "rawPrediction", "probability"))
      .select(col(munCol), col("prediction").as("impact"))
    // ntile_na: negative impact → NA, quintile over the rest (W9)
    val ranked = DamageProbability.priorityIndex(
      continuous.withColumn("impact",
          when(col("impact") < 0, lit(null).cast("double"))
            .otherwise(col("impact")))
        .withColumnRenamed(munCol, "Mun_Code"),
      "impact").withColumnRenamed("Mun_Code", munCol)
    classified.join(ranked, Seq(munCol), "left")
      .select(munCol, "impact_threshold_passed", distCol, "impact",
        "priority_index")
  }
}
