package graft.tracks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Track time-series preparation (SURVEY.md §2.6 W1–W5).
  *
  * Column contract for a tracks DataFrame (long format, one row per
  * (storm_id, ens_id, time) — the reference's list-of-xarray-Datasets
  * becomes one partitioned table):
  *   storm_id: string, ens_id: int, time: timestamp,
  *   lat, lon, max_sustained_wind, central_pressure,
  *   environmental_pressure, radius_max_wind: double (nullable).
  *
  * All operators are window expressions partitioned by (storm_id,
  * ens_id) — at scale each storm×member series is processed
  * independently and in parallel, which is exactly the reference's
  * per-member Python loop made partition-parallel.
  */
object TrackPrep {

  private val byTrack = Window.partitionBy("storm_id", "ens_id").orderBy("time")

  /** W1: time_step in hours since the previous node (first node: 0).
    * Reference: tc_tracks_forecast.py:322. */
  def withTimeStep(tracks: DataFrame): DataFrame =
    tracks.withColumn("time_step",
      coalesce(
        (unix_timestamp(col("time")) - unix_timestamp(lag("time", 1).over(byTrack))) / 3600.0,
        lit(0.0)))

  /** W3: linear interpolation of null values along time within each
    * track, matching pandas `Series.interpolate()` semantics exactly:
    * leading nulls stay null, interior nulls are linearly interpolated
    * between the surrounding non-null observations, trailing nulls are
    * filled with the last non-null value.
    * Reference: track_data_clean.py:11-18. */
  def interpolateLinear(tracks: DataFrame, valueCols: Seq[String]): DataFrame = {
    val before = byTrack.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after  = byTrack.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    valueCols.foldLeft(tracks) { (df, c) =>
      val obs   = when(col(c).isNotNull, struct(col("time").as("t"), col(c).as("v")))
      val prevO = last(obs, ignoreNulls = true).over(before)
      val nextO = first(obs, ignoreNulls = true).over(after)
      val t  = unix_timestamp(col("time")).cast("double")
      val t0 = unix_timestamp(prevO("t")).cast("double")
      val t1 = unix_timestamp(nextO("t")).cast("double")
      df.withColumn(c,
        when(col(c).isNotNull, col(c))
          .when(prevO.isNull, lit(null).cast("double"))       // leading: stay null
          .when(nextO.isNull, prevO("v"))                     // trailing: ffill
          .otherwise(prevO("v") + (nextO("v") - prevO("v")) * (t - t0) / (t1 - t0)))
    }
  }

  /** W4: resample each track to a fixed step (default 30 min) with
    * linear interpolation — generate the dense time grid per track,
    * left-join the observations, then interpolate.
    * Reference: track_data_clean.py:43 (`resample("0.5H").interpolate`).
    *
    * Scale note: the grid is generated with `sequence`+`explode` inside
    * each (storm_id, ens_id) group — no driver-side loop, no shuffle
    * beyond the one groupBy (the join back is on the same keys, so AQE
    * keeps it co-partitioned).
    */
  def resample(tracks: DataFrame, valueCols: Seq[String],
               stepMinutes: Int = 30): DataFrame = {
    val meta = tracks.columns.filterNot(c =>
      valueCols.contains(c) || Seq("time").contains(c))
    val grid = tracks
      .groupBy("storm_id", "ens_id")
      .agg(min("time").as("t_min"), max("time").as("t_max"))
      .select(col("storm_id"), col("ens_id"),
        explode(sequence(col("t_min"), col("t_max"),
          expr(s"INTERVAL $stepMinutes MINUTES"))).as("time"))
    val joined = grid.join(
      tracks.select((Seq("storm_id", "ens_id", "time") ++ valueCols).map(col): _*),
      Seq("storm_id", "ens_id", "time"), "left")
    interpolateLinear(joined, valueCols)
      .withColumn("time_step", lit(stepMinutes / 60.0))
  }

  /** W5: forward speed (km/h) and bearing (deg) toward the next node. */
  def withKinematics(tracks: DataFrame): DataFrame = {
    import graft.functions.GeoFunctions._
    val nLat = lead("lat", 1).over(byTrack)
    val nLon = lead("lon", 1).over(byTrack)
    val dtH  = (unix_timestamp(lead("time", 1).over(byTrack)) -
                unix_timestamp(col("time"))) / 3600.0
    tracks
      .withColumn("fwd_speed_kmh",
        haversineKm(col("lat"), col("lon"), nLat, nLon) / dtH)
      .withColumn("bearing_deg", bearingDeg(col("lat"), col("lon"), nLat, nLon))
  }

  /** P3: HRES vs ensemble split (forecast_process.py:296-297,517 —
    * `is_ensemble` is a STRING 'False'/'TRUE', a reference quirk
    * preserved at ingest). */
  def hresOnly(tracks: DataFrame): DataFrame =
    tracks.where(col("is_ensemble") === "False")
  def ensembleOnly(tracks: DataFrame): DataFrame =
    tracks.where(col("is_ensemble") =!= "False")

  /** S7: active-event feed filter — keep TC events whose point falls in
    * the monitoring box (Check_for_active_typhoon.py:7-52). */
  def activeEventsInBox(events: DataFrame,
                        minLat: Double = 5, maxLat: Double = 21,
                        minLon: Double = 115, maxLon: Double = 135): DataFrame =
    events
      .where(col("event_type") === "TC")
      .where(col("lat") > minLat && col("lat") < maxLat &&
             col("lon") > minLon && col("lon") < maxLon)

  /** P1: keep storms whose track enters the Philippine Area of
    * Responsibility box, HRES (is_ensemble false) members deciding.
    * Reference: forecast_process.py:197-213 (minlat<21 ∧ maxlat>5 ∧
    * minlon<135 ∧ maxlon>115 on the non-ensemble track). Returns the
    * full tracks table semi-joined to active storms — all members of an
    * active storm are kept. */
  def filterActivePAR(tracks: DataFrame,
                      minLat: Double = 5, maxLat: Double = 21,
                      minLon: Double = 115, maxLon: Double = 135): DataFrame = {
    val active = tracks
      .where(col("is_ensemble") === "False")
      .groupBy("storm_id")
      .agg(min("lat").as("mnla"), max("lat").as("mxla"),
           min("lon").as("mnlo"), max("lon").as("mxlo"))
      .where(col("mnla") < maxLat && col("mxla") > minLat &&
             col("mnlo") < maxLon && col("mxlo") > minLon)
      .select("storm_id")
    tracks.join(active, Seq("storm_id"), "left_semi")
  }
}
