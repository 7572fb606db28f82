package graft

import org.apache.spark.sql.functions._

import graft.functions.{GeoFunctions, ScalarFunctions}

class ScalarFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("v")).collect().head.get(0)

  test("piecewise hat-sum hits the knot values exactly") {
    ScalarFunctions.RmwKnots.zip(ScalarFunctions.RmwValues).foreach { case (k, v) =>
      assert(eval1(ScalarFunctions.piecewiseLinear(lit(k),
        ScalarFunctions.RmwKnots, ScalarFunctions.RmwValues)) == v)
    }
  }

  test("piecewise interpolates linearly between knots") {
    // midpoint of (940, 980): (15.726927 + 25.742142)/2
    val got = eval1(ScalarFunctions.estimateRmwNm(lit(960.0))).asInstanceOf[Double]
    assert(math.abs(got - (15.726927 + 25.742142) / 2) < 1e-9)
  }

  test("piecewise clamps outside the knot range (boundary hats have one zero slope)") {
    val below = eval1(ScalarFunctions.estimateRmwNm(lit(800.0))).asInstanceOf[Double]
    assert(math.abs(below - 14.907318) < 1e-9)
    val above = eval1(ScalarFunctions.estimateRmwNm(lit(1100.0))).asInstanceOf[Double]
    assert(math.abs(above - 56.856522) < 1e-9)
  }

  test("pagasa category bin edges") {
    val df = Seq(10.0, 61.9, 62.0, 88.0, 117.0, 185.0, 300.0).toDF("kph")
      .select(ScalarFunctions.pagasaCategory($"kph").as("c"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("TD", "TD", "TS", "STS", "TY", "STY", "STY"))
  }

  test("saffir-simpson bin edges") {
    val df = Seq(10.0, 18.0, 33.0, 70.9, 71.0).toDF("ms")
      .select(ScalarFunctions.saffirSimpson($"ms").as("c"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(-1, 0, 1, 4, 5))
  }

  test("affected population power law: zero below 1, truncation, null passthrough") {
    val df = Seq[Option[Double]](Some(0.5), Some(100.0), None).toDF("x")
      .select(ScalarFunctions.affectedPopulation($"x").as("a"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == 0L)
    val expect = math.floor(math.exp(6.80943612231606) * math.pow(100.0, 0.46982114400549513)).toLong
    assert(rows(1).getLong(0) == expect)
    assert(rows(2).isNullAt(0))
  }

  test("haversine: zero distance to self, symmetric, ~111.19 km per degree") {
    val df = Seq((10.0, 120.0, 11.0, 120.0)).toDF("lat1", "lon1", "lat2", "lon2")
    val d12 = df.select(GeoFunctions.haversineKm($"lat1", $"lon1", $"lat2", $"lon2"))
      .collect().head.getDouble(0)
    val d21 = df.select(GeoFunctions.haversineKm($"lat2", $"lon2", $"lat1", $"lon1"))
      .collect().head.getDouble(0)
    assert(d12 == d21)
    assert(math.abs(d12 - 111.19) < 0.1)
    val self = df.select(GeoFunctions.haversineKm($"lat1", $"lon1", $"lat1", $"lon1"))
      .collect().head.getDouble(0)
    assert(self == 0.0)
  }

  test("normalizeLon wraps into [center-180, center+180)") {
    val df = Seq((190.0, 0.0), (-190.0, 0.0), (365.0, 0.0)).toDF("lon", "c")
    val got = df.select(GeoFunctions.normalizeLon($"lon", $"c")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(-170.0, 170.0, 5.0))
  }

  test("clip bounds") {
    val got = Seq(0.5, 1.7, 3.0).toDF("x")
      .select(ScalarFunctions.clip($"x", 1.0, 2.5).as("c")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(1.0, 1.7, 2.5))
  }
}
