package graft.tracks

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** CLIMADA `equal_timestep` re-expressed as a distributed operator
  * (src/climada/hazard/tc_tracks.py:1129-1166, 1417-1465):
  * per (storm_id, ens_id) track, generate an hourly-or-finer grid
  * anchored at midnight of the first node's day (pandas resample
  * `origin='start_day'`), restricted to the original time bounds,
  * then interpolate
  *  - lat/lon with an order-min(2, n-2) spline (cubic not-a-knot for
  *    n >= 4, after the reference's ±180° sign-change unwrap), and
  *  - every other data var linearly;
  * `time_step` becomes the constant new step. Tracks with < 2 nodes
  * pass through unchanged, like the reference's warning branch.
  *
  * Execution: `flatMapGroups` over the track key — each series is
  * small (≤ a few hundred nodes) and independent, so the operator
  * scales with the number of storm×member series, the same axis the
  * cluster parallelizes everything else on.
  */
object EqualTimestep {

  /** One track node — the CLIMADA surface of the tracks contract. */
  case class Node(storm_id: String, ens_id: Int, time: Timestamp,
                  lat: Double, lon: Double,
                  central_pressure: Double, environmental_pressure: Double,
                  radius_max_wind: Double, max_sustained_wind: Double,
                  time_step: Double)

  private val MsPerHour = 3600000.0

  def resampleOne(nodes: Seq[Node], stepH: Double): Seq[Node] = {
    if (nodes.length < 2) return nodes
    val sorted = nodes.sortBy(_.time.getTime)
    val t0 = sorted.head.time.getTime
    val tn = sorted.last.time.getTime
    // pandas origin='start_day': grid anchored at midnight (UTC) of the
    // first node's day; first emitted point is the first grid point >= t0
    val anchor = t0 - Math.floorMod(t0, 86400000L)
    // round, don't truncate: (1.0/3)*3600000 = 1199999.99... must land on
    // the 1200000 ms pandas grid. Supported steps are the ms-representable
    // ones; anything else would silently drift off the resample grid.
    val stepMsExact = stepH * MsPerHour
    val stepMs = Math.round(stepMsExact)
    require(stepMs > 0 && math.abs(stepMsExact - stepMs) < 1e-3,
      s"time_step_h=$stepH is not representable on a millisecond grid")
    val first = anchor + ((t0 - anchor) + stepMs - 1) / stepMs * stepMs
    val grid = Iterator.iterate(first)(_ + stepMs).takeWhile(_ <= tn).toArray

    val xs = sorted.map(n => (n.time.getTime - t0) / MsPerHour).toArray
    val xq = grid.map(t => (t - t0) / MsPerHour)

    // reference: unwrap longitudes crossing the antimeridian before
    // interpolation, re-wrap after (tc_tracks.py:1437-1448)
    val lons = sorted.map(_.lon).toArray
    val crosses = lons.exists(_ < -170) && lons.exists(_ > 170)
    val lonKnots = if (crosses) lons.map(l => if (l < 0) l + 360 else l) else lons

    val lat = CubicSpline.interpolate(xs, sorted.map(_.lat).toArray, xq)
    val lon0 = CubicSpline.interpolate(xs, lonKnots, xq)
    val lon = if (crosses) lon0.map(l => if (l > 180) l - 360 else l) else lon0
    def lin(f: Node => Double) =
      CubicSpline.evalLinear(xs, sorted.map(f).toArray, xq)
    val pcen = lin(_.central_pressure)
    val penv = lin(_.environmental_pressure)
    val rmw = lin(_.radius_max_wind)
    val vmax = lin(_.max_sustained_wind)

    val head = sorted.head
    grid.indices.map { i =>
      Node(head.storm_id, head.ens_id, new Timestamp(grid(i)),
        lat(i), lon(i), pcen(i), penv(i), rmw(i), vmax(i), stepH)
    }
  }

  /** The distributed operator. Input needs the `Node` columns. */
  def apply(tracks: DataFrame, stepH: Double = 1.0): Dataset[Node] = {
    val spark = tracks.sparkSession
    import spark.implicits._
    tracks
      .select(col("storm_id"), col("ens_id"), col("time"), col("lat"), col("lon"),
        col("central_pressure"), col("environmental_pressure"),
        col("radius_max_wind"), col("max_sustained_wind"),
        coalesce(col("time_step"), lit(0.0)).as("time_step"))
      .as[Node]
      .groupByKey(n => (n.storm_id, n.ens_id))
      .flatMapGroups((_, it) => resampleOne(it.toSeq, stepH).iterator)
  }
}
