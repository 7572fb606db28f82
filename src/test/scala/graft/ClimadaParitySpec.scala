package graft

import org.apache.spark.sql.functions._

import graft.hazard.Windfield
import graft.sources.ClimadaSources
import graft.tracks.{CubicSpline, EqualTimestep}

/** End-to-end intensity parity against CLIMADA's own golden values
  * (src/climada/hazard/test/test_trop_cyclone.py:46-105,
  * test_set_one_pass): the 1951239N12334 track CSV, the Barbados
  * centroids MATLAB file, hourly cubic `equal_timestep`, the full H08
  * windfield, and max-over-time intensity with the 17.5 m/s threshold
  * — every stage running the real engine code, for BOTH distance
  * metrics. This certifies the entire X1–X6 chain (SURVEY.md §2.10)
  * against the reference's published numbers, not just the per-kernel
  * MATLAB goldens.
  */
class ClimadaParitySpec extends SparkTestBase {

  private val dataDir = "/root/reference/IBF-Typhoon-model/src/climada/hazard/test/data"

  private val intensityIdx = Seq(0, 1, 2, 3, 80, 100, 120, 200, 220, 250, 260, 295)
  private val goldens = Map(
    "geosphere" -> Seq(25.60794285, 26.90906280, 28.26649026, 25.54076797, 31.21986961,
                       36.17171808, 21.11408573, 28.01457948, 32.65349378, 31.34027741, 0.0,
                       40.27362679),
    "equirect" -> Seq(25.60778909, 26.90887264, 28.26624642, 25.54092386, 31.21941738,
                      36.16596567, 21.11399856, 28.01452136, 32.65076804, 31.33884098, 0.0,
                      40.27002104))

  private lazy val centroids = ClimadaSources.readMatCentroids(
    spark, s"$dataDir/centr_brb_test.mat").cache()

  private lazy val hourlyTrack = EqualTimestep(
    ClimadaSources.readProcessedIbtracsCsv(spark, s"$dataDir/trac_brb_test.csv"),
    stepH = 1.0).toDF().cache()

  test("ibtracs csv read: estimated pressure, 38 six-hourly nodes") {
    val t = ClimadaSources.readProcessedIbtracsCsv(spark, s"$dataDir/trac_brb_test.csv")
      .orderBy("time").collect()
    assert(t.length == 38)
    val first = t.head
    // pcen = 1026.3401 - 0.05504*12.3 - 0.03536*(-25.6) - 0.7357*25.0
    val expected = 1026.3401 - 0.05504 * 12.3 - 0.03536 * -25.6 - 0.7357 * 25.0
    assert(math.abs(first.getAs[Double]("central_pressure") - expected) < 1e-9)
    assert(first.getAs[java.sql.Timestamp]("time").toString.startsWith("1951-08-27 06:00"))
  }

  test("equal_timestep: hourly grid within original bounds, cubic lat/lon") {
    val rows = hourlyTrack.orderBy("time").collect()
    assert(rows.length == (38 - 1) * 6 + 1) // 223 hourly nodes
    assert(rows.head.getAs[java.sql.Timestamp]("time").toString.startsWith("1951-08-27 06:00"))
    assert(rows.last.getAs[java.sql.Timestamp]("time").toString.startsWith("1951-09-05 12:00"))
    assert(rows.forall(_.getAs[Double]("time_step") == 1.0))
    // knot values are reproduced exactly
    assert(math.abs(rows.head.getAs[Double]("lat") - 12.3) < 1e-12)
    assert(math.abs(rows.head.getAs[Double]("lon") - -25.6) < 1e-12)
  }

  test("mat centroids: 296 Barbados points") {
    assert(centroids.count() == 296)
    val r = centroids.orderBy("centroid_id").first()
    assert(math.abs(r.getAs[Double]("lat") - 13.125) < 1e-12)
    assert(math.abs(r.getAs[Double]("lon") - -59.625000000000014) < 1e-12)
  }

  for (metric <- Seq("geosphere", "equirect")) {
    test(s"e2e intensity matches CLIMADA goldens ($metric)") {
      val wf = Windfield.compute(hourlyTrack, centroids, metric)
      val intens = wf.groupBy("centroid_id").agg(max("speed").as("intensity"))
        .where(col("intensity") >= Windfield.IntensityThresh)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(intens.size == 280, s"expected 280 nonzero intensities, got ${intens.size}")
      intensityIdx.zip(goldens(metric)).foreach { case (idx, expected) =>
        val actual = intens.getOrElse(idx.toLong, 0.0)
        assert(math.abs(actual - expected) < 5e-8,
          s"centroid $idx: $actual vs golden $expected (diff ${actual - expected})")
      }
    }
  }

  test("not-a-knot spline reproduces cubics exactly and passes knots") {
    val xs = Array(0.0, 1.0, 2.5, 4.0, 5.0, 7.0)
    def f(x: Double) = 2.0 - 3.0 * x + 0.5 * x * x - 0.125 * x * x * x
    val ys = xs.map(f)
    val xq = Array(0.3, 1.7, 3.9, 6.2)
    val got = CubicSpline.evalCubic(xs, ys, CubicSpline.notAKnotMoments(xs, ys), xq)
    xq.zip(got).foreach { case (x, y) =>
      assert(math.abs(y - f(x)) < 1e-10, s"at $x: $y vs ${f(x)}")
    }
    val atKnots = CubicSpline.evalCubic(xs, ys, CubicSpline.notAKnotMoments(xs, ys), xs)
    xs.indices.foreach(i => assert(atKnots(i) == ys(i)))
  }
}
