package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesy as pure column expressions (whole-stage-codegen friendly; no
  * UDFs). Mirrors the reference's scalar geo helpers:
  *   - haversine (IBF-Typhoon-model/src/typhoonmodel/utility_fun/
  *     forecast_process.py:636-653)
  *   - lon normalization (src/climada/util/coordinates.py:117-160)
  *   - flat-earth deg*111 distance (forecast_process.py:1603-1619 —
  *     preserved deliberately; the reference uses it for the
  *     track-distance loop even though haversine exists 20 lines away)
  */
object GeoFunctions {
  val EarthRadiusKm = 6371.0

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * inputs in degrees. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                  radiusKm: Double = EarthRadiusKm): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * radiusKm) * asin(sqrt(a))
  }

  /** Initial bearing (degrees, [0,360)) from point 1 to point 2. */
  def bearingDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLon = radians(lon2 - lon1)
    val y = sin(dLon) * cos(radians(lat2))
    val x = cos(radians(lat1)) * sin(radians(lat2)) -
      sin(radians(lat1)) * cos(radians(lat2)) * cos(dLon)
    (degrees(atan2(y, x)) + 360.0) % 360.0
  }

  /** Normalize longitude into [center-180, center+180). */
  def normalizeLon(lon: Column, center: Column): Column =
    ((lon - center + 180.0) % 360.0 + 360.0) % 360.0 - 180.0 + center

  /** The reference's flat-earth approximation: degrees × 111 km,
    * euclidean. Kept for parity with its track-distance operator. */
  def flatEarthKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    sqrt(pow(lat2 - lat1, 2) + pow(lon2 - lon1, 2)) * 111.0

  /** Equirectangular approximate distance in km (fast path of the
    * reference's dist_approx; src/climada/util/coordinates.py:241-322). */
  def equirectKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val kmPerDeg = math.Pi / 180.0 * EarthRadiusKm
    val dLon = (lon2 - lon1) * cos(radians((lat1 + lat2) / 2))
    sqrt(pow(lat2 - lat1, 2) + pow(dLon, 2)) * kmPerDeg
  }
}
