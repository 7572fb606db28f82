package graft.rain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.SpatialJoin

/** Rainfall processing (SURVEY.md §2.1 S4, §2.5 A7/A8; reference
  * Rainfall_data.py:69-126).
  *
  * The GRIB cube (time × lat × lon × ensemble member) is long-format
  * here: (time, lat, lon, number, precip). Operators:
  *   1. ensemble MEDIAN per grid cell (the reference stores only the
  *      median of the 30 GEFS members),
  *   2. zonal mean per admin area per timestep (via the precomputed
  *      centroid→admin map — same machinery as the windfield),
  *   3. max over timesteps per admin area, for each accumulation
  *      window (6h / 24h).
  *
  * Scale: the median shuffles once on (time, cell); zonal stats reuse
  * the broadcast centroid→admin map; everything else is partial aggs.
  */
object Rainfall {

  /** S4: exact ensemble median per (time, lat, lon) grid cell.
    * Spark's `median` is exact interpolated — matching
    * xarray's `ds.median(dim='number')`. */
  def ensembleMedian(cube: DataFrame): DataFrame =
    cube.groupBy("time", "lat", "lon")
      .agg(median(col("precip")).as("precip"))

  /** Snap grid cells to centroid ids so the windfield's centroid→admin
    * map can be reused: nearest grid point by floor division. Grid is
    * 0.5° GEFS; `cellId` is a deterministic function of (lat, lon). */
  def withCellId(grid: DataFrame, res: Double = 0.5,
                 latMax: Double = 90.0, lonMin: Double = -180.0): DataFrame =
    grid.withColumn("centroid_id",
      (floor((lit(latMax) - col("lat")) / res) * math.round(360.0 / res) +
        floor((col("lon") - lonMin) / res)).cast("long"))

  /** A7 + A8: per-admin rainfall summary for one accumulation window:
    * zonal mean per timestep, then max over timesteps. Null zonal
    * means (no cells in a zone) become 0 like the reference. */
  def adminRainfall(medianCube: DataFrame, centroidAdmin: DataFrame): DataFrame = {
    val zonal = SpatialJoin.zonalMean(
      medianCube.select(col("centroid_id"), col("time"), col("precip").as("value")),
      centroidAdmin, Seq("time"))
    zonal.groupBy("admin_code")
      .agg(coalesce(max("zonal_mean"), lit(0.0)).as("max_rain"))
  }

  /** Full reference dataflow for both windows: returns one row per
    * admin area with max_6h_rain / max_24h_rain columns
    * (rain_data.csv shape, Mun_Code keyed). */
  def rainData(cube6h: DataFrame, cube24h: DataFrame,
               centroidAdmin: DataFrame): DataFrame = {
    val m6 = adminRainfall(withCellId(ensembleMedian(cube6h)), centroidAdmin)
      .withColumnRenamed("max_rain", "max_6h_rain")
    val m24 = adminRainfall(withCellId(ensembleMedian(cube24h)), centroidAdmin)
      .withColumnRenamed("max_rain", "max_24h_rain")
    m6.join(m24, Seq("admin_code"), "outer")
      .na.fill(0.0)
      .withColumnRenamed("admin_code", "Mun_Code")
  }

  /** 2.11: tumbling-window accumulation — aggregate finer-grained
    * precip into fixed windows (e.g. 6h) per cell; the batch twin of
    * the streaming `window()` aggregation. */
  def accumulate(cube: DataFrame, hours: Int): DataFrame =
    cube.groupBy(
      window(col("time"), s"$hours hours").as("w"),
      col("lat"), col("lon"))
      .agg(sum("precip").as("precip"))
      .select(col("w.start").as("time"), col("lat"), col("lon"), col("precip"))
}
