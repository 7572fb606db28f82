package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.publish.Landfall
import graft.sources.Tables

/** Landfall state machine under the oracle gate: run the REAL
  * `Landfall.evaluate` over synthetic per-user tracks derived from
  * `events` (on_land := event_type = 'purchase', deterministic), with
  * the per-storm state derivation mirrored in DuckDB SQL.
  */
object LandfallProbe {

  private val ForecastTime = Timestamp.valueOf("2024-01-01 00:00:00")

  val probes: Seq[Probe] = Seq(
    Probe("p01_landfall_state",
      (s, d) => {
        val track = Tables.events(s, d).select(
          col("user_id").cast("string").as("storm_id"),
          col("ts").as("time"),
          (col("value") / 25.0 + 5.0).as("lat"),
          (col("value") / 10.0 + 110.0).as("lon"),
          lit(44.0).as("vmax"),
          (col("event_type") === "purchase").as("on_land"),
          (col("value") * 10.0).as("dist_to_land_km"))
        val (state, _) = Landfall.evaluate(track, ForecastTime)
        state.select("storm_id", "landfall_code", "lead_time_hours", "lead_time")
          .orderBy("storm_id")
      },
      Some(s"""WITH track AS (
              |  SELECT CAST(user_id AS VARCHAR) AS storm_id, ts AS time,
              |    value / 10.0 + 110.0 AS lon,
              |    event_type = 'purchase' AS on_land,
              |    value * 10.0 AS dist FROM events),
              |agg AS (
              |  SELECT storm_id,
              |    MIN(CASE WHEN on_land THEN time END) AS first_land_time,
              |    MIN(dist) AS min_dist,
              |    MAX(lon) AS max_lon
              |  FROM track GROUP BY storm_id),
              |-- earliest time at the min distance (deterministic closest point)
              |closest AS (
              |  SELECT t.storm_id, MIN(t.time) AS closest_t
              |  FROM track t JOIN agg a ON a.storm_id = t.storm_id AND t.dist = a.min_dist
              |  GROUP BY t.storm_id),
              |st AS (
              |  SELECT a.storm_id, a.first_land_time, a.min_dist, a.max_lon,
              |    COALESCE(a.first_land_time, c.closest_t) AS ref_time
              |  FROM agg a JOIN closest c ON c.storm_id = a.storm_id),
              |h AS (
              |  SELECT *, CAST(FLOOR((FLOOR(EPOCH(ref_time)) -
              |      FLOOR(EPOCH(TIMESTAMP '2024-01-01'))) / 3600) AS INT)
              |      - ${Landfall.LatencyCorrectionH} AS hours0,
              |    (CAST(FLOOR((FLOOR(EPOCH(ref_time)) -
              |      FLOOR(EPOCH(TIMESTAMP '2024-01-01'))) / 3600) AS INT)
              |      - ${Landfall.LatencyCorrectionH} < 0
              |     OR max_lon < ${Landfall.LonLimitLeadtime}) AS past
              |  FROM st),
              |codes AS (
              |  SELECT storm_id, hours0,
              |    CASE WHEN first_land_time IS NOT NULL THEN
              |           CASE WHEN past THEN 2 WHEN hours0 > 168 THEN 10 ELSE 1 END
              |         WHEN min_dist < ${Landfall.MaxDistFromCoastKm} THEN
              |           CASE WHEN past THEN 5 WHEN hours0 > 168 THEN 6 ELSE 3 END
              |         ELSE 60 END AS landfall_code
              |  FROM h)
              |SELECT storm_id, landfall_code,
              |  CASE WHEN landfall_code IN (2, 5) THEN 0
              |       WHEN landfall_code = 60 THEN 168
              |       ELSE hours0 END AS lead_time_hours,
              |  concat(CAST(CASE WHEN landfall_code IN (2, 5) THEN 0
              |       WHEN landfall_code = 60 THEN 168
              |       ELSE hours0 END AS VARCHAR), '-hour') AS lead_time
              |FROM codes ORDER BY storm_id""".stripMargin)),
  )
}
