package graft.hazard

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ScalarFunctions

/** X7: the Willoughby et al. 2006 sectioned wind profile — the legacy
  * R path's wind model (lib_r/prepare_typhoon_input.R:200-516).
  * Secondary to Holland (the operational path), kept for full surface
  * coverage.
  *
  * Everything is a column expression except the Newton-Raphson ξ
  * solve, which is a scalar Scala UDF (pure, deterministic, ≤100
  * iterations) — exactly the place SURVEY.md §2.12 budgets a UDF.
  */
object Willoughby {

  /** Eq. 7a: radius of maximum wind (km) from gradient wind + lat. */
  def rmax(vmaxGl: Column, lat: Column): Column =
    lit(46.4) * exp(lit(-0.0155) * vmaxGl + lit(0.0169) * lat)

  /** Eq. 10a: decay length X1 (km). */
  def x1(vmaxGl: Column, lat: Column): Column =
    lit(317.1) - lit(2.026) * vmaxGl + lit(1.915) * lat

  /** Eq. 10b: inner-profile exponent n. */
  def nExp(vmaxGl: Column, lat: Column): Column =
    lit(0.4067) + lit(0.0144) * vmaxGl - lit(0.0038) * lat

  /** Eq. 10c: dual-exponential weight A (clamped ≥ 0). */
  def aCoeff(vmaxGl: Column, lat: Column): Column =
    greatest(lit(0.0), lit(0.0696) + lit(0.0049) * vmaxGl - lit(0.0064) * lat)

  /** Eq. 3 right-hand side — target of the ξ root-solve. */
  def eq3Right(n: Column, a: Column, x1: Column, rmax: Column): Column = {
    val num = n * ((lit(1.0) - a) * x1 + lit(25.0) * a)
    num / (num + rmax)
  }

  /** The degree-9 polynomial ramp w(ξ) and its derivative
    * (prepare_typhoon_input.R:277-283). */
  def rampPoly(xi: Double): Double =
    70 * math.pow(xi, 9) - 315 * math.pow(xi, 8) + 540 * math.pow(xi, 7) -
      420 * math.pow(xi, 6) + 126 * math.pow(xi, 5)
  private def rampDeriv(xi: Double): Double =
    70 * 9 * math.pow(xi, 8) - 315 * 8 * math.pow(xi, 7) + 540 * 7 * math.pow(xi, 6) -
      420 * 6 * math.pow(xi, 5) + 126 * 5 * math.pow(xi, 4)

  /** Newton-Raphson solve of w(ξ) = eq3Right, the reference's exact
    * loop (xi₀ = 0.5, eps = 1e-3, ≤100 iterations; R:285-303). */
  def solveXi(eq3Right: Double, xi0: Double = 0.5,
              eps: Double = 1e-3, itMax: Int = 100): Option[Double] = {
    if (eq3Right.isNaN) None
    else {
      var xi = xi0
      var i = 1
      var f = rampPoly(xi) - eq3Right
      while (i <= itMax && math.abs(f) > eps) {
        xi = xi - f / rampDeriv(xi)
        f = rampPoly(xi) - eq3Right
        i += 1
      }
      if (math.abs(f) <= eps) Some(xi) else None
    }
  }

  private val solveXiUdf = udf((e: Double) => solveXi(e))

  /** Transition-region half width: R2−R1 = 25 km if Rmax > 20 else 15
    * (R:311-315); R1 = Rmax − ξ·(R2−R1). */
  def r1(rmax: Column, xi: Column): Column =
    rmax - xi * when(rmax > 20, 25.0).otherwise(15.0)

  /** Eq. 1: sectioned profile — inner power law, outer dual
    * exponential, degree-9 polynomial blend in the transition ring
    * (R:325-347). Negative winds clamp to 0. */
  def gradientWind(dist: Column, rmaxC: Column, r1C: Column,
                   vmaxGl: Column, n: Column, a: Column, x1C: Column,
                   x2: Double = 25.0): Column = {
    val r2 = r1C + when(rmaxC > 20, 25.0).otherwise(15.0)
    val vi = vmaxGl * pow(dist / rmaxC, n)
    val vo = vmaxGl * ((lit(1.0) - a) * exp((rmaxC - dist) / x1C) +
      a * exp((rmaxC - dist) / x2))
    val epsC = (dist - r1C) / (r2 - r1C)
    val w = lit(126.0) * pow(epsC, 5) - lit(420.0) * pow(epsC, 6) +
      lit(540.0) * pow(epsC, 7) - lit(315.0) * pow(epsC, 8) + lit(70.0) * pow(epsC, 9)
    greatest(lit(0.0),
      when(dist < r1C, vi)
        .when(dist > r2, vo)
        .otherwise(vi * (lit(1.0) - w) + vo * w))
  }

  /** Gradient → surface reduction factor (R:352-360; the operational
    * R code then overrides it to 1 — both exposed). */
  def surfaceReduction(dist: Column, overrideToOne: Boolean = true): Column =
    if (overrideToOne) lit(1.0)
    else when(dist <= 100, 0.9)
      .when(dist >= 700, 0.75)
      .otherwise(lit(0.9) - (dist - 100) * (0.15 / 600))

  /** Inflow angle (Phadke et al. 2003) + 20° overland (R:367-390). */
  def inflowAngle(dist: Column, rmaxC: Column): Column = {
    val base = when(dist < rmaxC, lit(10.0) + (lit(1.0) + dist / rmaxC))
      .when(dist < lit(1.2) * rmaxC, lit(20.0) + lit(25.0) * (dist / rmaxC - 1.0))
      .otherwise(25.0)
    (base + 20.0) % 360.0
  }

  /** Forward-speed add-back (R:394-414): rotate the symmetric surface
    * wind into u/v by `swdDeg`, add the decayed translational
    * components, return the magnitude (clamped ≥ 0). */
  def addForwardSpeed(windSym: Column, spdU: Column, spdV: Column,
                      swdDeg: Column, dist: Column, rmaxC: Column): Column = {
    val swd = radians(swdDeg)
    val corr = (rmaxC * dist) / (rmaxC * rmaxC + dist * dist)
    val u = windSym * cos(swd) + corr * spdU
    val v = windSym * sin(swd) + corr * spdV
    greatest(lit(0.0), sqrt(u * u + v * v))
  }

  /** Full per-(node × centroid) Willoughby surface wind: parameter
    * columns from vmax_gl + lat, ξ via the UDF, sectioned profile,
    * gust = 1.49 × sustained (R:489). Input columns: dist_km, vmax_gl,
    * lat, spd_u, spd_v, bearing_deg. */
  def surfaceWind(df: DataFrame): DataFrame = {
    val withParams = df
      .withColumn("w_rmax", rmax(col("vmax_gl"), col("lat")))
      .withColumn("w_x1", x1(col("vmax_gl"), col("lat")))
      .withColumn("w_n", nExp(col("vmax_gl"), col("lat")))
      .withColumn("w_a", aCoeff(col("vmax_gl"), col("lat")))
    val withXi = withParams
      .withColumn("w_xi", solveXiUdf(
        eq3Right(col("w_n"), col("w_a"), col("w_x1"), col("w_rmax"))))
      .withColumn("w_r1", r1(col("w_rmax"), col("w_xi")))
    withXi
      .withColumn("wind_gl", gradientWind(col("dist_km"), col("w_rmax"),
        col("w_r1"), col("vmax_gl"), col("w_n"), col("w_a"), col("w_x1")))
      .withColumn("wind_sfc_sym", col("wind_gl") * surfaceReduction(col("dist_km")))
      .withColumn("swd",
        (col("bearing_deg") + lit(90.0) + inflowAngle(col("dist_km"), col("w_rmax"))) % 360.0)
      .withColumn("wind_sfc", addForwardSpeed(col("wind_sfc_sym"),
        col("spd_u"), col("spd_v"), col("swd"), col("dist_km"), col("w_rmax")))
      .withColumn("gust", col("wind_sfc") * 1.49)
  }
}
