package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.tracks.TrackPrep

class TrackPrepSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("W1 time_step: hours since previous node, first node 0") {
    val df = Seq(
      ("S", 1, ts("2024-01-01 00:00:00")),
      ("S", 1, ts("2024-01-01 06:00:00")),
      ("S", 1, ts("2024-01-01 09:00:00"))).toDF("storm_id", "ens_id", "time")
    val got = TrackPrep.withTimeStep(df).orderBy("time")
      .select("time_step").collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.0, 6.0, 3.0))
  }

  test("W3 interpolation matches pandas semantics: leading null stays, interior linear, trailing ffilled") {
    val df = Seq(
      ("S", 1, ts("2024-01-01 00:00:00"), Option.empty[Double]),
      ("S", 1, ts("2024-01-01 01:00:00"), Some(10.0)),
      ("S", 1, ts("2024-01-01 02:00:00"), Option.empty[Double]),
      ("S", 1, ts("2024-01-01 03:00:00"), Some(40.0)),
      ("S", 1, ts("2024-01-01 04:00:00"), Option.empty[Double]))
      .toDF("storm_id", "ens_id", "time", "v")
    val got = TrackPrep.interpolateLinear(df, Seq("v")).orderBy("time")
      .select("v").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(None, Some(10.0), Some(25.0), Some(40.0), Some(40.0)))
  }

  test("W3 interpolation weights by time, not row position") {
    val df = Seq(
      ("S", 1, ts("2024-01-01 00:00:00"), Some(0.0)),
      ("S", 1, ts("2024-01-01 01:00:00"), Option.empty[Double]),
      ("S", 1, ts("2024-01-01 04:00:00"), Some(8.0)))
      .toDF("storm_id", "ens_id", "time", "v")
    val got = TrackPrep.interpolateLinear(df, Seq("v")).orderBy("time")
      .select("v").collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.0, 2.0, 8.0))   // 1h of 4h → 1/4 of the way
  }

  test("W4 resample to 30 min: dense grid with linear values") {
    val df = Seq(
      ("S", 1, ts("2024-01-01 00:00:00"), 0.0, 120.0),
      ("S", 1, ts("2024-01-01 06:00:00"), 6.0, 121.2))
      .toDF("storm_id", "ens_id", "time", "lat", "lon")
    val got = TrackPrep.resample(df, Seq("lat", "lon")).orderBy("time").cache()
    assert(got.count() == 13)   // 6h at 30-min steps inclusive
    val r = got.collect()
    assert(r(1).getAs[Double]("lat") == 0.5)
    assert(math.abs(r(1).getAs[Double]("lon") - 120.1) < 1e-9)
    assert(r.forall(_.getAs[Double]("time_step") == 0.5))
    got.unpersist()
  }

  test("W5 kinematics: eastward track bearing ~90, speed positive") {
    val df = Seq(
      ("S", 1, ts("2024-01-01 00:00:00"), 10.0, 120.0),
      ("S", 1, ts("2024-01-01 06:00:00"), 10.0, 121.0))
      .toDF("storm_id", "ens_id", "time", "lat", "lon")
    val got = TrackPrep.withKinematics(df).orderBy("time").collect()
    assert(math.abs(got(0).getAs[Double]("bearing_deg") - 90.0) < 1.0)
    assert(got(0).getAs[Double]("fwd_speed_kmh") > 0)
    assert(got(1).isNullAt(got(1).fieldIndex("fwd_speed_kmh")))
  }

  test("P1 PAR filter keeps storms inside the box and all their members") {
    val df = Seq(
      // storm A: HRES inside PAR + an ensemble member
      ("A", 0, ts("2024-01-01 00:00:00"), 14.0, 125.0, "False"),
      ("A", 1, ts("2024-01-01 00:00:00"), 14.5, 125.5, "TRUE"),
      // storm B: HRES far outside
      ("B", 0, ts("2024-01-01 00:00:00"), 35.0, 150.0, "False"))
      .toDF("storm_id", "ens_id", "time", "lat", "lon", "is_ensemble")
    val got = TrackPrep.filterActivePAR(df).select("storm_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(got == Set("A"))
    assert(TrackPrep.filterActivePAR(df).count() == 2)
  }
}
