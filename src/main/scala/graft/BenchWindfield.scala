package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hazard.{CentroidGrid, Windfield}
import graft.tracks.TrackPrep

/** Operational-volume windfield benchmark: the reference's worst case
  * (BASELINE.md) — 52 ensemble members, 10-day horizon resampled to
  * 30 minutes (~480 nodes/member), the full 181×261 = 47,241-point
  * 0.05° Philippine grid. Prints one JSON line with stage timings and
  * output row counts.
  */
object BenchWindfield {
  def main(args: Array[String]): Unit = {
    val metric = args.headOption.getOrElse("geosphere")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 52-member ensemble, 6-hourly over 10 days, crossing the PH box
    // west-northwest — deterministic member spread
    val members = 52
    val steps6h = 40   // 10 days
    val base = (for {
      ens <- 0 until members
      k <- 0 until steps6h
    } yield (
      "BENCH", ens,
      java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .plusHours(6L * k).format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))),
      8.0 + k * 0.25 + (ens % 7) * 0.15,        // lat: 8 → 18
      132.0 - k * 0.45 - (ens % 5) * 0.12,      // lon: 132 → 114
      1005.0 - math.min(k, 20) * 2.0 + ens * 0.1,
      1010.0, 0.0))
      .toDF("storm_id", "ens_id", "time", "lat", "lon",
        "central_pressure", "environmental_pressure", "radius_max_wind")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (resampled, tResample) = timed {
      TrackPrep.resample(base, Seq("lat", "lon", "central_pressure",
        "environmental_pressure", "radius_max_wind")).cache()
    }
    val nNodes = resampled.count()

    val centroids = CentroidGrid.philippines(spark)
    val (wf, tPlan) = timed(Windfield.compute(resampled, centroids, metric))
    val (nPairs, tCompute) = timed(wf.count())

    val (inten, tIntensity) = timed {
      Windfield.intensity(Windfield.compute(resampled, centroids, metric))
        .count()
    }

    // full production query: windfield → per-municipality max-wind +
    // min flat-earth track distance, ~1650 synthetic municipalities
    val centroidAdmin = centroids.select(
      col("centroid_id"),
      concat(lit("M"), (col("centroid_id") % 1650)).as("admin_code"))
    val hazard = Forecast.municipalHazard(resampled, centroids, centroidAdmin)
    val (nMuni, tMunicipal) = timed { hazard.cache(); hazard.count() }

    // trigger/aggregation TAIL at the same operational envelope — the
    // t01/t02 probe shapes (W6 dedup, per-member totals, exceedance
    // cross-agg, all four trigger tables + the damage-probability
    // municipality report) on the 52-member hazard:
    val (trigRows, tTriggers) = timed {
      val impact = hazard
        .withColumn("Mun_Code",
          concat(lit("PH"), lpad((abs(hash(col("Mun_Code"))) % 17).cast("string"), 2, "0"),
            substring(col("Mun_Code"), 2, 10)))
        .withColumn("damage_pct",
          least(lit(100.0), pow(col("HAZ_v_max"), 2) / lit(50.0)))
        .withColumn("damage_num", col("damage_pct") * lit(25.0))
      val rep = Forecast.triggers(impact)
      val muniReport = graft.impact.DamageProbability.municipalityTable(
        graft.impact.Triggers.dedupKeepMax(impact), 0.5, 100.0)
      rep.dref.count() + rep.cerf.count() + rep.start.count() +
        rep.hi.count() + muniReport.count()
    }
    hazard.unpersist()

    println(s"""{"metric":"windfield_operational","distance_metric":"$metric","members":$members,""" +
      s""""nodes":$nNodes,"centroids":47241,"pair_rows":$nPairs,""" +
      s""""intensity_rows":$inten,"municipal_rows":$nMuni,""" +
      s""""resample_sec":${f"$tResample%.2f"},""" +
      s""""windfield_sec":${f"$tCompute%.2f"},"intensity_sec":${f"$tIntensity%.2f"},""" +
      s""""municipal_sec":${f"$tMunicipal%.2f"},""" +
      s""""trigger_tail_rows":$trigRows,"trigger_tail_sec":${f"$tTriggers%.2f"}}""")
    spark.stop()
  }
}
