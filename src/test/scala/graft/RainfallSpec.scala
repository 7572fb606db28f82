package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.rain.Rainfall

class RainfallSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("S4 ensemble median: exact interpolated median over members") {
    val cube = Seq(
      (ts("2024-01-01 00:00:00"), 14.0, 122.0, 0, 1.0),
      (ts("2024-01-01 00:00:00"), 14.0, 122.0, 1, 3.0),
      (ts("2024-01-01 00:00:00"), 14.0, 122.0, 2, 100.0),
      (ts("2024-01-01 00:00:00"), 14.0, 122.0, 3, 2.0))
      .toDF("time", "lat", "lon", "number", "precip")
    val got = Rainfall.ensembleMedian(cube).collect().head.getAs[Double]("precip")
    assert(got == 2.5)   // median of 1,2,3,100
  }

  test("cell id is deterministic and unique per 0.5-degree cell") {
    val grid = Seq((14.25, 122.25), (14.25, 122.75), (14.75, 122.25))
      .toDF("lat", "lon")
    val ids = Rainfall.withCellId(grid).select("centroid_id")
      .collect().map(_.getLong(0))
    assert(ids.distinct.length == 3)
  }

  test("2.11 tumbling accumulation sums precip into fixed windows") {
    val cube = (0 until 12).map(h =>
      (ts(f"2024-01-01 $h%02d:00:00"), 14.0, 122.0, 1.0))
      .toDF("time", "lat", "lon", "precip")
    val acc = Rainfall.accumulate(cube, 6).orderBy("time").collect()
    assert(acc.length == 2)
    assert(acc.forall(_.getAs[Double]("precip") == 6.0))
  }
}
