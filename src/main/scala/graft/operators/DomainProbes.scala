package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.hazard.Windfield
import graft.sources.Tables
import graft.tracks.TrackPrep

/** Domain-kernel certification probes: run the REAL hazard/track code
  * paths (Windfield.statHolland, Windfield.holB, Windfield.geosphere +
  * withVTrans, TrackPrep.withTimeStep) over the driver's testdata
  * tables, with the same physics mirrored as DuckDB SQL. This puts the
  * Holland kernels under the driver's hash-match gate on thousands of
  * inputs, far beyond the five MATLAB goldens.
  *
  * Transcendental outputs are ROUNDed to 6 decimals on both sides
  * (libm vs JVM may differ in the last ulp).
  */
object DomainProbes {

  /** Synthetic track shaped from the events table: each user is a
    * "storm", events are nodes ordered by time, lat/lon derived from
    * `value`. (user_id, ts) verified unique at all SFs. */
  private def syntheticTrack(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("user_id").cast("string").as("storm_id"),
      lit(0).as("ens_id"),
      col("ts").as("time"),
      col("event_id"),
      (col("value") / 25.0 + 5.0).as("lat"),       // 5..24.6 — PH-ish band
      (col("value") / 10.0 + 110.0).as("lon"))     // 110..159

  private val trackSqlBase =
    """SELECT user_id AS storm_id, ts AS time, event_id,
      |value / 25.0 + 5.0 AS lat, value / 10.0 + 110.0 AS lon
      |FROM events""".stripMargin

  val probes: Seq[Probe] = Seq(

    // X4: Holland 1980 gradient wind over 10k+ distances ----------------
    Probe("d01_stat_holland",
      (s, d) => {
        val ev = Tables.events(s, d)
        // value in (0, 490] → distances 1..1961 km; physics params fixed
        val dc = col("value") * 4.0 + 1.0
        ev.withColumn("v_ang", round(Windfield.statHolland(
            dc, lit(40.665454622610511), lit(1.486076257880692),
            lit(1010.0), lit(970.8727666672957), lit(14.089110370469488)), 6))
          .select("event_id", "v_ang")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, ROUND(
             |  SQRT(GREATEST(0.0,
             |    100.0e0 * 1.486076257880692e0 / 1.15e0
             |      * POW(40.665454622610511 / (value * 4.0 + 1.0), 1.486076257880692)
             |      * (1010.0 - 970.8727666672957)
             |      * EXP(-POW(40.665454622610511 / (value * 4.0 + 1.0), 1.486076257880692))
             |    + (500.0e0 * (value * 4.0 + 1.0)
             |       * (2.0e0 * 0.0000729e0 * SIN(RADIANS(ABS(14.089110370469488)))))
             |      * (500.0e0 * (value * 4.0 + 1.0)
             |       * (2.0e0 * 0.0000729e0 * SIN(RADIANS(ABS(14.089110370469488)))))))
             |  - 500.0e0 * (value * 4.0 + 1.0)
             |    * (2.0e0 * 0.0000729e0 * SIN(RADIANS(ABS(14.089110370469488)))), 6) AS v_ang
             |FROM events ORDER BY event_id""".stripMargin)),

    // X3: Holland 2008 b-value with lag-derived pressure series ---------
    Probe("d02_hol_b",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts")
        val ev = Tables.events(s, d)
          .withColumn("pcen", lit(1010.0) - col("value") / 10.0)
          .withColumn("prev_pcen", lag("pcen", 1).over(w))
          .where(col("prev_pcen").isNotNull)
        ev.withColumn("hol_b", round(Windfield.holB(
            col("value") / 50.0, lit(1010.0), col("pcen"), col("prev_pcen"),
            lit(14.0), lit(3.0)), 6))
          .select("event_id", "hol_b")
          .orderBy("event_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, value, 1010.0 - value / 10.0 AS pcen,
             |    LAG(1010.0 - value / 10.0) OVER (PARTITION BY user_id ORDER BY ts) AS prev_pcen
             |  FROM events),
             |q AS (SELECT event_id, value, pcen, prev_pcen, 1010.0 - pcen AS pdelta
             |      FROM p WHERE prev_pcen IS NOT NULL)
             |SELECT event_id, ROUND(LEAST(GREATEST(
             |  -0.000044 * pdelta * pdelta + 0.01 * pdelta
             |  + 0.03 * (pcen - prev_pcen) / 3.0 - 0.014 * ABS(14.0)
             |  + 0.15 * POW(value / 50.0, 0.6 * (1.0 - pdelta / 215))
             |  + 1.0, 1.0), 2.5), 6) AS hol_b
             |FROM q ORDER BY event_id""".stripMargin)),

    // X2 + geosphere metric: translational velocity along a track -------
    Probe("d03_vtrans_geosphere",
      (s, d) => {
        val tracks = TrackPrep.withTimeStep(syntheticTrack(s, d))
        Windfield.withVTrans(tracks, "geosphere")
          .select(col("event_id"), round(col("v_trans_norm"), 6).as("v_trans"))
          .orderBy("event_id")
      },
      Some(s"""WITH t AS ($trackSqlBase),
              |n AS (
              |  SELECT event_id, lat, lon,
              |    LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon,
              |    COALESCE((FLOOR(EPOCH(time)) - FLOOR(EPOCH(LAG(time) OVER w))) / 3600.0, 0.0) AS tstep
              |  FROM t WINDOW w AS (PARTITION BY storm_id ORDER BY time)),
              |h AS (
              |  SELECT event_id, tstep,
              |    DEGREES(2 * ASIN(SQRT(
              |      POW(SIN((RADIANS(lat) - RADIANS(plat)) / 2), 2) +
              |      COS(RADIANS(plat)) * COS(RADIANS(lat)) *
              |      POW(SIN((RADIANS(lon) - RADIANS(plon)) / 2), 2)))) * 111.12 AS dist
              |  FROM n),
              |v AS (SELECT event_id,
              |  CASE WHEN tstep > 0 THEN dist * (1.0 / 3.6) / tstep END AS norm FROM h)
              |SELECT event_id, ROUND(COALESCE(
              |  CASE WHEN norm > 30 * 0.514444444444444444
              |       THEN norm * ((30 * 0.514444444444444444) / norm) ELSE norm END, 0.0), 6) AS v_trans
              |FROM v ORDER BY event_id""".stripMargin)),

    // F5: the real category binning functions ---------------------------
    Probe("d05_categories",
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.select(col("event_id"),
            graft.functions.ScalarFunctions.pagasaCategory(col("value")).as("pagasa"),
            graft.functions.ScalarFunctions.saffirSimpson(col("value") / 5.0).as("saffir"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  CASE WHEN value < 62 THEN 'TD' WHEN value < 88 THEN 'TS'
             |       WHEN value < 117 THEN 'STS' WHEN value < 185 THEN 'TY'
             |       ELSE 'STY' END AS pagasa,
             |  CASE WHEN value / 5.0 < 18 THEN -1 WHEN value / 5.0 < 33 THEN 0
             |       WHEN value / 5.0 < 43 THEN 1 WHEN value / 5.0 < 50 THEN 2
             |       WHEN value / 5.0 < 59 THEN 3 WHEN value / 5.0 < 71 THEN 4
             |       ELSE 5 END AS saffir
             |FROM events ORDER BY event_id""".stripMargin)),

    // F2/F3: equirect metric with heaviside antimeridian wrap -----------
    Probe("d06_equirect_vtan",
      (s, d) => {
        val ev = Tables.events(s, d)
        // lon2 spans ±190° to exercise the wrap branch
        val (dist, vLat, vLon) = Windfield.equirect(
          col("value") / 50.0, lit(0.0), col("value") / 25.0,
          col("value") - 190.0)
        ev.select(col("event_id"), round(dist, 6).as("dist_km"),
            round(vLat, 6).as("v_lat"), round(vLon, 6).as("v_lon"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, value / 50.0 AS lat1, 0.0e0 AS lon1,
             |    value / 25.0 AS lat2, value - 190.0 AS lon2 FROM events),
             |w AS (
             |  SELECT event_id, lat1, lat2,
             |    (lon2 - lon1)
             |      - ((CASE WHEN (lon2 - lon1) - 180 > 0 THEN 1.0e0
             |               WHEN (lon2 - lon1) - 180 = 0 THEN 0.5e0 ELSE 0.0e0 END)
             |       - (CASE WHEN -(lon2 - lon1) - 180 > 0 THEN 1.0e0
             |               WHEN -(lon2 - lon1) - 180 = 0 THEN 0.5e0 ELSE 0.0e0 END)) * 360.0
             |      AS dlon
             |  FROM p),
             |v AS (
             |  SELECT event_id,
             |    (lat2 - lat1) * 111.12 AS v_lat,
             |    dlon * COS(RADIANS(lat1)) * 111.12 AS v_lon
             |  FROM w)
             |SELECT event_id, ROUND(SQRT(v_lat * v_lat + v_lon * v_lon), 6) AS dist_km,
             |  ROUND(v_lat, 6) AS v_lat, ROUND(v_lon, 6) AS v_lon
             |FROM v ORDER BY event_id""".stripMargin)),

    // F3: longitude normalization into [center-180, center+180) ---------
    Probe("d07_normalize_lon",
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.select(col("event_id"),
            graft.functions.GeoFunctions.normalizeLon(
              col("value") * 3.0 - 400.0, lit(120.0)).as("lon_n"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  ((((value * 3.0 - 400.0) - 120.0 + 180.0) % 360.0 + 360.0) % 360.0)
             |    - 180.0 + 120.0 AS lon_n
             |FROM events ORDER BY event_id""".stripMargin)),

    // W3 via TrackPrep.interpolateLinear: pandas-parity interpolation ---
    Probe("d08_interpolate",
      (s, d) => {
        val series = Tables.events(s, d).select(
          col("user_id").cast("string").as("storm_id"),
          lit(0).as("ens_id"),
          col("ts").as("time"),
          col("event_id"),
          when(!col("event_type").isin("view", "click"), col("value")).as("v"))
        TrackPrep.interpolateLinear(series, Seq("v"))
          .select("event_id", "v")
          .orderBy("event_id")
      },
      Some("""WITH base AS (
             |  SELECT CAST(user_id AS VARCHAR) AS storm_id, ts AS time, event_id,
             |    CASE WHEN event_type NOT IN ('view', 'click') THEN value END AS v
             |  FROM events),
             |obs AS (
             |  SELECT *,
             |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
             |      OVER wprev AS v0,
             |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN FLOOR(EPOCH(time)) END IGNORE NULLS)
             |      OVER wprev AS t0,
             |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
             |      OVER wnext AS v1,
             |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN FLOOR(EPOCH(time)) END IGNORE NULLS)
             |      OVER wnext AS t1
             |  FROM base
             |  WINDOW wprev AS (PARTITION BY storm_id ORDER BY time
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |         wnext AS (PARTITION BY storm_id ORDER BY time
             |                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT event_id,
             |  CASE WHEN v IS NOT NULL THEN v
             |       WHEN v0 IS NULL THEN NULL
             |       WHEN v1 IS NULL THEN v0
             |       ELSE v0 + (v1 - v0) * (FLOOR(EPOCH(time)) - t0) / (t1 - t0)
             |  END AS v
             |FROM obs ORDER BY event_id""".stripMargin)),

    // W4 via tracks.EqualTimestep: 30-min resample, quadratic lat/lon ---
    // 3-node tracks exercise the order-min(2,n-2) dispatch's quadratic
    // path (SQL-expressible as the Lagrange parabola) plus the linear
    // data-var path and pandas' start-of-day grid anchoring; the cubic
    // path is certified by ClimadaParitySpec's CLIMADA goldens.
    Probe("d09_equal_timestep",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val bySec = Window.partitionBy("user_id").orderBy("sec", "event_id")
        val deduped = Tables.events(s, d)
          .withColumn("sec", unix_timestamp(col("ts")))
          .withColumn("prev_sec", lag("sec", 1).over(bySec))
          .where(col("prev_sec").isNull || col("prev_sec") =!= col("sec"))
        val first3 = deduped
          .withColumn("rn", row_number().over(bySec))
          .where(col("rn") <= 3)
          .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
          .where(col("n") === 3)
        val tracks = first3.select(
          col("user_id").cast("string").as("storm_id"),
          lit(0).as("ens_id"),
          timestamp_seconds(col("sec")).as("time"),
          (col("value") / 25.0 + 5.0).as("lat"),
          (col("value") / 10.0 + 110.0).as("lon"),
          (lit(1010.0) - col("value") / 10.0).as("central_pressure"),
          lit(1010.0).as("environmental_pressure"),
          lit(0.0).as("radius_max_wind"),
          (col("value") / 5.0).as("max_sustained_wind"),
          lit(0.0).as("time_step"))
        graft.tracks.EqualTimestep(tracks, stepH = 0.5).toDF()
          .select(col("storm_id"), col("time"), col("lat"), col("lon"),
            col("central_pressure").as("pcen"))
          .orderBy("storm_id", "time")
      },
      Some {
        def quad(y0: String, y1: String, y2: String) =
          s"""$y0 * (x - x1) * (x - x2) / ((0.0e0 - x1) * (0.0e0 - x2))
             | + $y1 * (x - 0.0e0) * (x - x2) / ((x1 - 0.0e0) * (x1 - x2))
             | + $y2 * (x - 0.0e0) * (x - x1) / ((x2 - 0.0e0) * (x2 - x1))""".stripMargin
        s"""WITH e AS (
           |  SELECT user_id, event_id, value, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec
           |  FROM events),
           |dd AS (
           |  SELECT *, LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_sec
           |  FROM e),
           |n0 AS (
           |  SELECT user_id, sec, value,
           |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sec, event_id) AS rn
           |  FROM dd WHERE prev_sec IS NULL OR prev_sec <> sec),
           |tracks AS (
           |  SELECT user_id,
           |    MAX(CASE WHEN rn = 1 THEN sec END) AS s0,
           |    MAX(CASE WHEN rn = 2 THEN sec END) AS s1,
           |    MAX(CASE WHEN rn = 3 THEN sec END) AS s2,
           |    MAX(CASE WHEN rn = 1 THEN value END) AS v0,
           |    MAX(CASE WHEN rn = 2 THEN value END) AS v1,
           |    MAX(CASE WHEN rn = 3 THEN value END) AS v2
           |  FROM n0 WHERE rn <= 3 GROUP BY 1 HAVING COUNT(*) = 3),
           |grid AS (
           |  SELECT *,
           |    (s0 - s0 % 86400) + ((s0 - (s0 - s0 % 86400)) + 1799) // 1800 * 1800 AS t_first
           |  FROM tracks),
           |pts AS (
           |  SELECT g.*, g.t_first + 1800 * k.k AS t
           |  FROM grid g, LATERAL (
           |    SELECT UNNEST(generate_series(0, CAST((g.s2 - g.t_first) // 1800 AS BIGINT))) AS k) k
           |  WHERE g.t_first + 1800 * k.k <= g.s2),
           |xv AS (
           |  SELECT user_id, t,
           |    CAST((t - s0) * 1000 AS DOUBLE) / 3600000.0e0 AS x,
           |    CAST((s1 - s0) * 1000 AS DOUBLE) / 3600000.0e0 AS x1,
           |    CAST((s2 - s0) * 1000 AS DOUBLE) / 3600000.0e0 AS x2,
           |    v0 / 25.0e0 + 5.0e0 AS la0, v1 / 25.0e0 + 5.0e0 AS la1, v2 / 25.0e0 + 5.0e0 AS la2,
           |    v0 / 10.0e0 + 110.0e0 AS lo0, v1 / 10.0e0 + 110.0e0 AS lo1, v2 / 10.0e0 + 110.0e0 AS lo2,
           |    1010.0e0 - v0 / 10.0e0 AS p0, 1010.0e0 - v1 / 10.0e0 AS p1, 1010.0e0 - v2 / 10.0e0 AS p2
           |  FROM pts)
           |SELECT CAST(user_id AS VARCHAR) AS storm_id,
           |  make_timestamp(t * 1000000) AS time,
           |  ${quad("la0", "la1", "la2")} AS lat,
           |  ${quad("lo0", "lo1", "lo2")} AS lon,
           |  CASE WHEN x = 0.0e0 THEN p0 WHEN x = x1 THEN p1 WHEN x = x2 THEN p2
           |       WHEN x < x1 THEN p0 + (p1 - p0) * (x - 0.0e0) / (x1 - 0.0e0)
           |       ELSE p1 + (p2 - p1) * (x - x1) / (x2 - x1) END AS pcen
           |FROM xv ORDER BY storm_id, t""".stripMargin
      }),

    // F14 via the real rmw estimator: pressure → radius -----------------
    Probe("d04_rmw_estimate",
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.withColumn("rmw_km",
            graft.functions.ScalarFunctions.estimateRmwNm(
              lit(1010.0) - col("value") / 4.0) * Windfield.NmToKm)
          .select("event_id", "rmw_km")
          .orderBy("event_id")
      },
      Some({
        val knots  = graft.functions.ScalarFunctions.RmwKnots
        val values = graft.functions.ScalarFunctions.RmwValues
        val hatSum = knots.indices.map { i =>
          val s0 = if (i > 0) 1.0 / (knots(i) - knots(i - 1)) else 0.0
          val s1 = if (i + 1 < knots.length) 1.0 / (knots(i + 1) - knots(i)) else 0.0
          s"(${values(i)}) * GREATEST(0.0, 1.0 - ($s0) * GREATEST(0.0, (${knots(i)}) - (1010.0 - value / 4.0))" +
            s" - ($s1) * GREATEST(0.0, (1010.0 - value / 4.0) - (${knots(i)})))"
        }.mkString(" + ")
        s"SELECT event_id, ($hatSum) * 1.852 AS rmw_km FROM events ORDER BY event_id"
      })),

    // X7: the full Willoughby sectioned profile under the oracle gate —
    // parameters 10a-c, eq-3 target, the Newton-Raphson ξ solve
    // (mirrored as a recursive CTE running the same iteration:
    // xi₀ = 0.5, eps 1e-3, ≤100 steps), transition ring, dual-exp
    // outer profile, inflow angle and forward-speed add-back. ξ and
    // everything downstream are certified at round-6 plus the
    // convergence-contract boolean; the sub-ulp libm differences the
    // NR contraction leaves behind are ~1e-12.
    Probe("d10_willoughby_profile",
      (s, d) => {
        import graft.hazard.Willoughby
        val ev = Tables.events(s, d).select(
          col("event_id"),
          (col("value") * 4.0 + 1.0).as("dist_km"),
          (lit(20.0) + col("value") / 10.0).as("vmax_gl"),
          (lit(5.0) + col("value") / 20.0).as("lat"),
          lit(3.0).as("spd_u"), lit(4.0).as("spd_v"),
          (col("value") * 0.7).as("bearing_deg"))
        Willoughby.surfaceWind(ev)
          .select(col("event_id"),
            round(col("w_rmax"), 6).as("rmax"),
            round(Willoughby.eq3Right(col("w_n"), col("w_a"), col("w_x1"),
              col("w_rmax")), 6).as("eq3"),
            round(col("w_xi"), 6).as("xi"),
            col("w_xi").isNotNull.as("converged"),
            when(col("w_xi").isNotNull, round(col("wind_sfc"), 6)).as("wind_sfc"),
            when(col("w_xi").isNotNull, round(col("gust"), 6)).as("gust"))
          .orderBy("event_id")
      },
      Some({
        // DuckDB forbids the recursive self-reference inside a
        // subquery, so the Newton step xi' = xi - f/deriv is inlined
        // wherever the next iterate appears.
        val xin = "(xi - f / (630.0e0*POW(xi,8.0e0) - 2520.0e0*POW(xi,7.0e0)" +
          " + 3780.0e0*POW(xi,6.0e0) - 2520.0e0*POW(xi,5.0e0)" +
          " + 630.0e0*POW(xi,4.0e0)))"
        s"""WITH RECURSIVE base AS (
           |  SELECT event_id,
           |    value * 4.0e0 + 1.0e0 AS dist,
           |    20.0e0 + value / 10.0e0 AS v,
           |    5.0e0 + value / 20.0e0 AS lat,
           |    value * 0.7e0 AS bearing
           |  FROM events),
             |par AS (
             |  SELECT *,
             |    46.4e0 * EXP(-0.0155e0 * v + 0.0169e0 * lat) AS rmax,
             |    317.1e0 - 2.026e0 * v + 1.915e0 * lat AS x1,
             |    0.4067e0 + 0.0144e0 * v - 0.0038e0 * lat AS n,
             |    GREATEST(0.0e0, 0.0696e0 + 0.0049e0 * v - 0.0064e0 * lat) AS a
             |  FROM base),
             |tgt AS (
             |  SELECT *,
             |    (n * ((1.0e0 - a) * x1 + 25.0e0 * a))
             |      / ((n * ((1.0e0 - a) * x1 + 25.0e0 * a)) + rmax) AS e
             |  FROM par),
             |nr AS (
             |  SELECT event_id, 1 AS i, 0.5e0 AS xi,
             |    70.0e0*POW(0.5e0,9.0e0) - 315.0e0*POW(0.5e0,8.0e0)
             |      + 540.0e0*POW(0.5e0,7.0e0) - 420.0e0*POW(0.5e0,6.0e0)
             |      + 126.0e0*POW(0.5e0,5.0e0) - e AS f,
             |    e FROM tgt
           |  UNION ALL
           |  SELECT event_id, i + 1, $xin,
           |    70.0e0*POW($xin,9.0e0) - 315.0e0*POW($xin,8.0e0)
           |      + 540.0e0*POW($xin,7.0e0) - 420.0e0*POW($xin,6.0e0)
           |      + 126.0e0*POW($xin,5.0e0) - e,
           |    e
           |  FROM nr WHERE ABS(f) > 1e-3 AND i <= 100),
             |fin AS (
             |  SELECT event_id, xi, f,
             |    ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY i DESC) AS rn
             |  FROM nr),
             |fx AS (
             |  SELECT event_id, CASE WHEN ABS(f) <= 1e-3 THEN xi END AS xi
             |  FROM fin WHERE rn = 1),
             |w AS (
             |  SELECT t.*, fx.xi,
             |    t.rmax - fx.xi
             |      * (CASE WHEN t.rmax > 20.0e0 THEN 25.0e0 ELSE 15.0e0 END) AS r1,
             |    (CASE WHEN t.rmax > 20.0e0 THEN 25.0e0 ELSE 15.0e0 END) AS ring
             |  FROM tgt t JOIN fx USING (event_id)),
             |prof AS (
             |  SELECT *,
             |    GREATEST(0.0e0, CASE
             |      WHEN dist < r1 THEN v * POW(dist / rmax, n)
             |      WHEN dist > r1 + ring THEN
             |        v * ((1.0e0 - a) * EXP((rmax - dist) / x1)
             |             + a * EXP((rmax - dist) / 25.0e0))
             |      ELSE v * POW(dist / rmax, n)
             |             * (1.0e0 - (126.0e0*POW((dist - r1)/ring, 5.0e0)
             |               - 420.0e0*POW((dist - r1)/ring, 6.0e0)
             |               + 540.0e0*POW((dist - r1)/ring, 7.0e0)
             |               - 315.0e0*POW((dist - r1)/ring, 8.0e0)
             |               + 70.0e0*POW((dist - r1)/ring, 9.0e0)))
             |           + v * ((1.0e0 - a) * EXP((rmax - dist) / x1)
             |               + a * EXP((rmax - dist) / 25.0e0))
             |             * (126.0e0*POW((dist - r1)/ring, 5.0e0)
             |               - 420.0e0*POW((dist - r1)/ring, 6.0e0)
             |               + 540.0e0*POW((dist - r1)/ring, 7.0e0)
             |               - 315.0e0*POW((dist - r1)/ring, 8.0e0)
             |               + 70.0e0*POW((dist - r1)/ring, 9.0e0)) END) AS wind_gl,
             |    (bearing + 90.0e0
             |      + (((CASE WHEN dist < rmax THEN 10.0e0 + (1.0e0 + dist / rmax)
             |               WHEN dist < 1.2e0 * rmax THEN
             |                 20.0e0 + 25.0e0 * (dist / rmax - 1.0e0)
             |               ELSE 25.0e0 END) + 20.0e0) % 360.0e0)) % 360.0e0 AS swd
             |  FROM w),
             |sfc AS (
             |  SELECT *,
             |    GREATEST(0.0e0, SQRT(
             |      (wind_gl * 1.0e0 * COS(RADIANS(swd))
             |        + ((rmax * dist) / (rmax * rmax + dist * dist)) * 3.0e0)
             |      * (wind_gl * 1.0e0 * COS(RADIANS(swd))
             |        + ((rmax * dist) / (rmax * rmax + dist * dist)) * 3.0e0)
             |      + (wind_gl * 1.0e0 * SIN(RADIANS(swd))
             |        + ((rmax * dist) / (rmax * rmax + dist * dist)) * 4.0e0)
             |      * (wind_gl * 1.0e0 * SIN(RADIANS(swd))
             |        + ((rmax * dist) / (rmax * rmax + dist * dist)) * 4.0e0))) AS wind_sfc
             |  FROM prof)
             |SELECT event_id, ROUND(rmax, 6) AS rmax, ROUND(e, 6) AS eq3,
             |  ROUND(xi, 6) AS xi, xi IS NOT NULL AS converged,
             |  CASE WHEN xi IS NULL THEN NULL ELSE ROUND(wind_sfc, 6) END AS wind_sfc,
             |  CASE WHEN xi IS NULL THEN NULL
             |       ELSE ROUND(wind_sfc * 1.49e0, 6) END AS gust
             |FROM sfc ORDER BY event_id""".stripMargin
      })),
  )
}
