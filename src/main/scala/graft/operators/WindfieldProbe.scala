package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.hazard.Windfield
import graft.sources.Tables
import graft.tracks.TrackPrep

/** The capstone probe: the ENTIRE `Windfield.compute` assembly
  * (X1 bbox prune → geosphere distances/tangents → vtrans → Holland
  * 2008 b → Holland 1980 gradient wind → hemisphere rotation →
  * translational decay → vector sum) run as one lazy plan over a
  * synthetic ensemble derived from `events`, against a DuckDB oracle
  * that mirrors every floating-point operation in the same order.
  */
object WindfieldProbe {

  /** 8×8 centroid grid covering the synthetic track region. */
  private def centroids(spark: org.apache.spark.sql.SparkSession) =
    spark.range(64).select(
      col("id").as("centroid_id"),
      (lit(24.0) - expr("id div 8").cast("double") * 2.0).as("lat"),
      (lit(112.0) + expr("id % 8").cast("double") * 4.0).as("lon"))

  private val centroidSql =
    """SELECT i AS centroid_id,
      |  24.0e0 - CAST(i // 8 AS DOUBLE) * 2.0 AS c_lat,
      |  112.0e0 + CAST(i % 8 AS DOUBLE) * 4.0 AS c_lon
      |FROM generate_series(0, 63) g(i)""".stripMargin

  // synthetic ensemble: one storm per user (< 10), deduped to one event
  // per second so time_step > 0 everywhere
  private val trackSql =
    """SELECT CAST(user_id AS VARCHAR) AS storm_id, 0 AS ens_id, ts AS time,
      |  value / 25.0 + 5.0 AS lat, value / 10.0 + 110.0 AS lon,
      |  1010.0 - value / 10.0 AS central_pressure,
      |  1010.0e0 AS environmental_pressure
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, FLOOR(EPOCH(ts))
      |                               ORDER BY event_id) AS rn
      |  FROM events WHERE user_id < 10) WHERE rn = 1""".stripMargin

  /** Geosphere (dist, vlat, vlon) SQL fragments from (la1,lo1) to
    * (la2,lo2) column names — op-for-op the Scala expressions. */
  private def geosphereSql(lat1: String, lon1: String, lat2: String, lon2: String) = {
    val hav = s"POW(SIN((RADIANS($lat2) - RADIANS($lat1)) / 2), 2) + " +
      s"COS(RADIANS($lat1)) * COS(RADIANS($lat2)) * " +
      s"POW(SIN((RADIANS($lon2) - RADIANS($lon1)) / 2), 2)"
    val dist = s"DEGREES(2.0e0 * ASIN(SQRT($hav))) * 111.12e0"
    (hav, dist)
  }
  private def geoVtanSql(lat1: String, lon1: String, lat2: String, lon2: String,
                         hav: String, dist: String): (String, String) = {
    def vec(la: String, lo: String) = (
      s"COS(RADIANS($la)) * COS(RADIANS($lo))",
      s"COS(RADIANS($la)) * SIN(RADIANS($lo))",
      s"-SIN(RADIANS($la))")
    val (x1, y1, z1) = vec(lat1, lon1)
    val (x2, y2, z2) = vec(lat2, lon2)
    val (bnx, bny, bnz) = (
      s"-SIN(RADIANS($lat1)) * COS(RADIANS($lon1))",
      s"-SIN(RADIANS($lat1)) * SIN(RADIANS($lon1))",
      s"-COS(RADIANS($lat1))")
    val (bex, bey) = (s"-SIN(RADIANS($lon1))", s"COS(RADIANS($lon1))")
    val scal = s"(1.0e0 - 2.0e0 * ($hav))"
    val fact = s"(($dist) / GREATEST(2.220446049250313e-16, SQRT(1.0e0 - $scal * $scal)))"
    val (tx, ty, tz) = (
      s"($fact * (($x2) - $scal * ($x1)))",
      s"($fact * (($y2) - $scal * ($y1)))",
      s"($fact * (($z2) - $scal * ($z1)))")
    (s"($tx * ($bnx) + $ty * ($bny) + $tz * ($bnz))",
     s"($tx * ($bex) + $ty * ($bey))")
  }

  val probes: Seq[Probe] = Seq(
    Probe("w01_windfield_e2e",
      (s, d) => {
        // Dedup-to-one-row-per-second rephrased on the SAME partition
        // key every downstream window uses (storm_id, ens_id): lag of
        // the floor-second over (sec, event_id) order picks min
        // event_id per second exactly like the rn=1 form, but the
        // whole node-prep chain now runs off ONE hash exchange.
        val base = Tables.events(s, d).where(col("user_id") < 10)
          .select(col("user_id").cast("string").as("storm_id"),
            lit(0).as("ens_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("sec", unix_timestamp(col("ts")))
        val bySec = Window.partitionBy("storm_id", "ens_id")
          .orderBy("sec", "event_id")
        val dedup = base
          .withColumn("prev_sec", lag("sec", 1).over(bySec))
          .where(col("prev_sec").isNull || col("prev_sec") =!= col("sec"))
        val tracks = TrackPrep.withTimeStep(dedup.select(
          col("storm_id"),
          col("ens_id"),
          col("ts").as("time"),
          (col("value") / 25.0 + 5.0).as("lat"),
          (col("value") / 10.0 + 110.0).as("lon"),
          (lit(1010.0) - col("value") / 10.0).as("central_pressure"),
          lit(1010.0).as("environmental_pressure")))
          .withColumn("radius_max_wind", lit(0.0))
        Windfield.compute(tracks, centroids(s), "geosphere")
          .select(col("storm_id"), col("time"), col("centroid_id"),
            round(col("d_centr"), 6).as("d_centr"),
            round(col("w_lat"), 6).as("w_lat"),
            round(col("w_lon"), 6).as("w_lon"),
            round(col("speed"), 6).as("speed"))
          .orderBy("storm_id", "time", "centroid_id")
      },
      Some {
        val knots  = graft.functions.ScalarFunctions.RmwKnots
        val values = graft.functions.ScalarFunctions.RmwValues
        val hatSum = knots.indices.map { i =>
          val s0 = if (i > 0) 1.0 / (knots(i) - knots(i - 1)) else 0.0
          val s1 = if (i + 1 < knots.length) 1.0 / (knots(i + 1) - knots(i)) else 0.0
          s"(${values(i)}) * GREATEST(0.0, 1.0 - ($s0) * GREATEST(0.0, (${knots(i)}) - (pcen))" +
            s" - ($s1) * GREATEST(0.0, (pcen) - (${knots(i)})))"
        }.mkString(" + ")
        val (havT, distT) = geosphereSql("plat", "plon", "lat", "lon")
        val (vlatT, vlonT) = geoVtanSql("plat", "plon", "lat", "lon", havT, distT)
        val (havC, distC) = geosphereSql("lat", "lon", "c_lat", "c_lon")
        val (vlatC, vlonC) = geoVtanSql("lat", "lon", "c_lat", "c_lon", havC, distC)
        val cap = "30 * 0.514444444444444444"
        s"""WITH track0 AS ($trackSql),
           |cent AS ($centroidSql),
           |n0 AS (
           |  SELECT *,
           |    LEAST(central_pressure, environmental_pressure) AS pcen,
           |    COALESCE((FLOOR(EPOCH(time)) - FLOOR(EPOCH(LAG(time) OVER w))) / 3600.0, 0.0)
           |      AS time_step,
           |    LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon,
           |    ROW_NUMBER() OVER w - 1 AS node_idx,
           |    COUNT(*) OVER (PARTITION BY storm_id, ens_id) AS n_nodes,
           |    CASE WHEN SUM(CASE WHEN lat < 0 THEN 1 ELSE 0 END)
           |              OVER (PARTITION BY storm_id, ens_id) >
           |            SUM(CASE WHEN lat > 0 THEN 1 ELSE 0 END)
           |              OVER (PARTITION BY storm_id, ens_id)
           |         THEN -1.0e0 ELSE 1.0e0 END AS hemi
           |  FROM track0 WINDOW w AS (PARTITION BY storm_id, ens_id ORDER BY time)),
           |n1 AS (
           |  SELECT *, ($hatSum) * 1.852 AS rmw_km,
           |    CASE WHEN time_step > 0 THEN time_step END AS tstep,
           |    $havT AS hav_t, $distT AS dist_t
           |  FROM n0),
           |n2 AS (
           |  SELECT *,
           |    dist_t * (1.0 / 3.6) / tstep AS vnorm0,
           |    $vlatT * (1.0 / 3.6) / tstep AS vlat0,
           |    $vlonT * (1.0 / 3.6) / tstep AS vlon0
           |  FROM n1),
           |n3 AS (
           |  SELECT *,
           |    COALESCE(vnorm0 * (CASE WHEN vnorm0 > $cap THEN ($cap) / vnorm0 ELSE 1.0e0 END), 0.0e0)
           |      AS v_trans_norm,
           |    COALESCE(vlat0 * (CASE WHEN vnorm0 > $cap THEN ($cap) / vnorm0 ELSE 1.0e0 END), 0.0e0)
           |      AS v_trans_lat,
           |    COALESCE(vlon0 * (CASE WHEN vnorm0 > $cap THEN ($cap) / vnorm0 ELSE 1.0e0 END), 0.0e0)
           |      AS v_trans_lon,
           |    CASE WHEN LAG(pcen) OVER w2 < 850 THEN pcen ELSE LAG(pcen) OVER w2 END AS prev_pcen
           |  FROM n2 WINDOW w2 AS (PARTITION BY storm_id, ens_id ORDER BY time)),
           |nodes AS (
           |  SELECT *,
           |    LEAST(GREATEST(
           |      -0.000044 * (environmental_pressure - pcen) * (environmental_pressure - pcen)
           |      + 0.01 * (environmental_pressure - pcen)
           |      + 0.03 * (pcen - prev_pcen) / time_step - 0.014 * ABS(lat)
           |      + 0.15 * POW(v_trans_norm, 0.6 * (1.0 - (environmental_pressure - pcen) / 215))
           |      + 1.0, 1.0), 2.5) AS hol_b
           |  FROM n3 WHERE n_nodes >= 2),
           |reachable AS (
           |  SELECT DISTINCT storm_id, ens_id, centroid_id, c_lat, c_lon
           |  FROM nodes JOIN cent
           |    ON c_lat > lat - 5.5 AND c_lat < lat + 5.5
           |   AND ((c_lon - lon + 180.0) % 360.0 + 360.0) % 360.0 - 180.0 > -5.5
           |   AND ((c_lon - lon + 180.0) % 360.0 + 360.0) % 360.0 - 180.0 < 5.5),
           |pairs AS (
           |  SELECT n.*, r.centroid_id, r.c_lat, r.c_lon,
           |    $distC AS d_centr, $vlatC AS vt_lat, $vlonC AS vt_lon
           |  FROM nodes n JOIN reachable r USING (storm_id, ens_id)),
           |flt AS (
           |  SELECT * FROM pairs
           |  WHERE d_centr > 0.01 AND d_centr < 1000.0 AND node_idx >= 1),
           |wind AS (
           |  SELECT *,
           |    SQRT(GREATEST(0.0e0,
           |      100.0e0 * hol_b / 1.15e0 * POW(rmw_km / d_centr, hol_b)
           |        * (environmental_pressure - pcen)
           |        * EXP(-POW(rmw_km / d_centr, hol_b))
           |      + (500.0e0 * d_centr * (2.0e0 * 0.0000729e0 * SIN(RADIANS(ABS(lat)))))
           |        * (500.0e0 * d_centr * (2.0e0 * 0.0000729e0 * SIN(RADIANS(ABS(lat)))))))
           |    - 500.0e0 * d_centr * (2.0e0 * 0.0000729e0 * SIN(RADIANS(ABS(lat)))) AS v_ang,
           |    LEAST(1.0e0, rmw_km / d_centr) AS corr
           |  FROM flt),
           |vecs AS (
           |  SELECT *,
           |    v_trans_lat * corr + v_ang * (hemi * vt_lon / d_centr) AS w_lat0,
           |    v_trans_lon * corr + v_ang * ((-hemi) * vt_lat / d_centr) AS w_lon0
           |  FROM wind),
           |fin AS (
           |  SELECT storm_id, time, centroid_id, d_centr,
           |    CASE WHEN isnan(w_lat0) OR w_lat0 IS NULL THEN 0.0e0 ELSE w_lat0 END AS w_lat,
           |    CASE WHEN isnan(w_lon0) OR w_lon0 IS NULL THEN 0.0e0 ELSE w_lon0 END AS w_lon
           |  FROM vecs)
           |SELECT storm_id, time, centroid_id,
           |  ROUND(d_centr, 6) AS d_centr, ROUND(w_lat, 6) AS w_lat,
           |  ROUND(w_lon, 6) AS w_lon,
           |  ROUND(SQRT(w_lat * w_lat + w_lon * w_lon), 6) AS speed
           |FROM fin ORDER BY storm_id, time, centroid_id""".stripMargin
      }),
  )
}
