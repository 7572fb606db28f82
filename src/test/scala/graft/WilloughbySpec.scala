package graft

import org.apache.spark.sql.functions._

import graft.hazard.Willoughby

class WilloughbySpec extends SparkTestBase {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).collect().head.getDouble(0)

  test("X7 parameter equations match the published formulas") {
    // vmax_gl = 50 m/s, lat = 14°
    assert(math.abs(eval1(Willoughby.rmax(lit(50.0), lit(14.0))) -
      46.4 * math.exp(-0.0155 * 50 + 0.0169 * 14)) < 1e-12)
    assert(math.abs(eval1(Willoughby.x1(lit(50.0), lit(14.0))) -
      (317.1 - 2.026 * 50 + 1.915 * 14)) < 1e-12)
    assert(math.abs(eval1(Willoughby.nExp(lit(50.0), lit(14.0))) -
      (0.4067 + 0.0144 * 50 - 0.0038 * 14)) < 1e-12)
    // A clamps at 0 for strong negative inputs
    assert(eval1(Willoughby.aCoeff(lit(0.0), lit(60.0))) == 0.0)
  }

  test("Newton-Raphson xi solve: root of the degree-9 ramp") {
    // typical roots 0.6–0.65 per the reference's own comment
    val xi = Willoughby.solveXi(0.7).get
    assert(math.abs(Willoughby.rampPoly(xi) - 0.7) <= 1e-3)
    assert(xi > 0.3 && xi < 1.0)
    assert(Willoughby.solveXi(Double.NaN).isEmpty)
  }

  test("sectioned profile: peak at Rmax, inner power law, outer decay") {
    val vmaxGl = 50.0; val lat = 14.0
    val rm = 46.4 * math.exp(-0.0155 * vmaxGl + 0.0169 * lat)
    val df = Seq(1.0, rm / 2, rm, rm + 50, rm + 300).toDF("dist_km")
      .withColumn("vmax_gl", lit(vmaxGl)).withColumn("lat", lit(lat))
      .withColumn("spd_u", lit(0.0)).withColumn("spd_v", lit(0.0))
      .withColumn("bearing_deg", lit(0.0))
    val winds = Willoughby.surfaceWind(df).orderBy("dist_km")
      .select("dist_km", "wind_gl").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val byDist = winds.toMap
    // wind at Rmax ≈ vmax_gl (profile peaks at the radius of max wind)
    assert(math.abs(byDist(rm) - vmaxGl) < 1.0)
    // monotone rise inside, decay outside
    assert(byDist(1.0) < byDist(rm / 2) && byDist(rm / 2) < byDist(rm))
    assert(byDist(rm + 50) < byDist(rm) && byDist(rm + 300) < byDist(rm + 50))
    assert(winds.forall(_._2 >= 0.0))
  }

  test("forward-speed correction peaks at Rmax and adds vectorially") {
    val corr = (d: Double, rm: Double) => rm * d / (rm * rm + d * d)
    assert(corr(30.0, 30.0) == 0.5)   // max value 1/2 at d = Rmax
    val got = eval1(Willoughby.addForwardSpeed(
      lit(30.0), lit(5.0), lit(0.0), lit(0.0), lit(30.0), lit(30.0)))
    assert(math.abs(got - (30.0 + 0.5 * 5.0)) < 1e-12)
  }

  test("gust factor 1.49x sustained") {
    val df = Seq(100.0).toDF("dist_km")
      .withColumn("vmax_gl", lit(40.0)).withColumn("lat", lit(14.0))
      .withColumn("spd_u", lit(0.0)).withColumn("spd_v", lit(0.0))
      .withColumn("bearing_deg", lit(0.0))
    val r = Willoughby.surfaceWind(df).select("wind_sfc", "gust").collect().head
    assert(math.abs(r.getDouble(1) - r.getDouble(0) * 1.49) < 1e-12)
  }
}
