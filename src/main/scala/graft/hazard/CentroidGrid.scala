package graft.hazard

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F16: raster centroid grid generated from an affine transform —
  * deterministic, re-derivable, broadcastable; the reference
  * materializes the same grid from raster metadata
  * (src/climada/hazard/centroids/centr.py:289-310, instantiated at
  * forecast_process.py:73-76 with bounds (118,6,127,19) and res 0.05°
  * → 181×261 = 47,241 points).
  */
object CentroidGrid {

  /** Point grid over [lonMin,lonMax]×[latMin,latMax] inclusive at `res`
    * degrees, row-major from the top-left (north-west) corner — the
    * raster convention the reference uses. */
  def generate(spark: SparkSession,
               lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
               res: Double): DataFrame = {
    val nCols = math.round((lonMax - lonMin) / res).toInt + 1
    val nRows = math.round((latMax - latMin) / res).toInt + 1
    spark.range(nCols.toLong * nRows)
      .select(
        col("id").as("centroid_id"),
        (lit(latMax) - (col("id") / nCols).cast("long") * res).as("lat"),
        (lit(lonMin) + (col("id") % nCols) * res).as("lon"))
  }

  /** The operational Philippine grid (forecast_process.py:73-76). */
  def philippines(spark: SparkSession): DataFrame =
    generate(spark, 118.0, 6.0, 127.0, 19.0, 0.05)
}
