package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source adapters for CLIMADA's own file formats, built on the
  * from-scratch `Hdf5File` reader — no native HDF5/NetCDF library.
  *
  *  - `readMatCentroids`: MATLAB 7.3 centroid files
  *    (`Centroids.read_mat`, src/climada/hazard/centroids/centr.py:424-468);
  *  - `readIbtracsNetcdf`: CLIMADA-written NetCDF-4 track files
  *    (SURVEY.md §2.1 S9) with CF "units since epoch" time decode;
  *  - `readProcessedIbtracsCsv`: the processed-IBTrACS CSV track format
  *    (`TCTracks.read_processed_ibtracs_csv`,
  *    src/climada/hazard/tc_tracks.py:1467-1527) including the
  *    missing-pressure statistical estimate (`_estimate_pressure`,
  *    tc_tracks.py:1635-1670).
  */
object ClimadaSources {

  /** (centroid_id, lat, lon) from a MATLAB 7.3 centroids file;
    * centroid_id is the 0-based array index (the reference addresses
    * centroids positionally). */
  def readMatCentroids(spark: SparkSession, path: String): DataFrame = {
    val f = Hdf5File.open(path)
    val root = if (f.list("/").contains("centroids")) "/centroids"
               else "/hazard" // DEF_VAR_MAT field_names fallback
    val lat = f.readDoubles(s"$root/lat")
    val lon = f.readDoubles(s"$root/lon")
    require(lat.length == lon.length, "lat/lon length mismatch")
    import spark.implicits._
    lat.indices.map(i => (i.toLong, lat(i), lon(i)))
      .toDF("centroid_id", "lat", "lon")
  }

  /** CF time decode: "<unit> since <epoch>" → epoch micros. */
  def cfTimeToMicros(values: Array[Double], units: String): Array[Long] = {
    val Pattern = """(\w+) since (\d{4}-\d{2}-\d{2})[T ]?(\d{2}:\d{2}:\d{2})?.*""".r
    val (unitMicros, epoch) = units match {
      case Pattern(u, date, time) =>
        val mult = u.toLowerCase match {
          case "days" | "day" => 86400e6
          case "hours" | "hour" => 3600e6
          case "minutes" | "minute" => 60e6
          case "seconds" | "second" => 1e6
          case other => throw new IllegalArgumentException(s"unknown CF time unit: $other")
        }
        val t = Option(time).getOrElse("00:00:00")
        val inst = java.time.Instant.parse(s"${date}T${t}Z")
        (mult, inst.getEpochSecond * 1000000L)
      case other => throw new IllegalArgumentException(s"unparseable CF units: $other")
    }
    values.map(v => epoch + (v * unitMicros).round)
  }

  /** One CLIMADA-written NetCDF-4 track file → tracks DataFrame with
    * the standard column contract. `storm_id` defaults to the file
    * stem; `ens_id` 0. */
  def readIbtracsNetcdf(spark: SparkSession, path: String,
                        stormId: String = null, ensId: Int = 0): DataFrame = {
    val f = Hdf5File.open(path)
    val sid = Option(stormId).getOrElse(
      path.split("/").last.stripSuffix(".nc"))
    val timeRaw = f.readDoubles("/time")
    val units = f.attributes("/time").getOrElse("units",
      sys.error("time has no CF units attribute")).asInstanceOf[String]
    val micros = cfTimeToMicros(timeRaw, units)
    def v(name: String): Array[Double] =
      if (f.list("/").contains(name)) f.readDoubles(s"/$name")
      else Array.fill(timeRaw.length)(Double.NaN)
    val (lat, lon) = (v("lat"), v("lon"))
    val (pcen, penv) = (v("central_pressure"), v("environmental_pressure"))
    val (rmw, vmax, tstep) = (v("radius_max_wind"), v("max_sustained_wind"), v("time_step"))
    val rows = micros.indices.map { i =>
      org.apache.spark.sql.Row(sid, ensId,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros(i), 1000000L),
          Math.floorMod(micros(i), 1000000L) * 1000L)),
        lat(i), lon(i), pcen(i), penv(i), rmw(i), vmax(i), tstep(i))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("storm_id", StringType), StructField("ens_id", IntegerType),
        StructField("time", TimestampType), StructField("lat", DoubleType),
        StructField("lon", DoubleType), StructField("central_pressure", DoubleType),
        StructField("environmental_pressure", DoubleType),
        StructField("radius_max_wind", DoubleType),
        StructField("max_sustained_wind", DoubleType),
        StructField("time_step", DoubleType))))
  }

  /** ECMWF ensemble TC track BUFR file → tracks DataFrame, decoded
    * from the BINARY message by the from-scratch `Bufr` decoder (the
    * reference round-trips through pybufrkit's text render instead;
    * `TrackSources.parseBufrLines` covers that surface). Mirrors the
    * reference's assembly (tc_tracks_forecast.py:265-329): one track
    * per subset, the analysis block dropped, storm-centre (008005=1)
    * positions, pressure in mb, env pressure defaulted to 1010, time
    * from the section-1 forecast time plus the 004024 hour offsets.
    * Steps where the member has no data (missing lat) are dropped. */
  def readEcmwfBufr(spark: SparkSession, path: String): DataFrame = {
    val msg = Bufr.decode(path)
    val forecastMicros = java.time.Instant.parse(
      f"${msg.year}%04d-${msg.month}%02d-${msg.day}%02d" +
        f"T${msg.hour}%02d:${msg.minute}%02d:00Z").getEpochSecond * 1000000L
    val rows = msg.subsets.flatMap { subset =>
      def str(d: Int) = subset.find(_.descriptor == d).flatMap(_.str).getOrElse("")
      def num(d: Int) = subset.find(_.descriptor == d).flatMap(_.num)
      val sid = str(1025).trim
      val name = str(1027).trim
      val member = num(1091).map(_.toInt).getOrElse(0)
      val isEns = num(1092).forall(_ != 0.0) // missing type → ensemble
      // walk blocks: significance state + step boundaries at 004024
      var sig = -1
      var step = -1 // -1 = analysis block
      case class Step(h: Double, var lat: Option[Double] = None,
                      var lon: Option[Double] = None, var latM: Option[Double] = None,
                      var lonM: Option[Double] = None, var pcen: Option[Double] = None,
                      var wind: Option[Double] = None,
                      radii: Array[Array[Double]] = Array.fill(3, 4)(Double.NaN))
      val steps = scala.collection.mutable.ArrayBuffer[Step]()
      // wind-radii walk state: the template nests, per step,
      // 019003 (threshold 18/26/33 m/s) → 4 × [005021 bearing-start,
      // 005021 bearing-end, 019004 radius]; quadrants are named by the
      // start bearing (0=NE, 90=SE, 180=SW, 270=NW).
      var radThreshold = -1
      val bearings = scala.collection.mutable.ArrayBuffer[Double]()
      def thresholdIdx(ms: Double): Int =
        if (ms == 18.0) 0 else if (ms == 26.0) 1 else if (ms == 33.0) 2 else -1
      def quadIdx(bearing: Double): Int = ((bearing / 90.0).toInt % 4 + 4) % 4
      subset.foreach { v =>
        v.descriptor match {
          case 8005 => sig = v.num.map(_.toInt).getOrElse(-1)
          case 4024 => v.num.foreach { h => steps += Step(h); step += 1 }
          case 5002 if sig == 1 && step >= 0 => steps(step).lat = v.num
          case 6002 if sig == 1 && step >= 0 => steps(step).lon = v.num
          case 5002 if sig == 3 && step >= 0 => steps(step).latM = v.num
          case 6002 if sig == 3 && step >= 0 => steps(step).lonM = v.num
          case 10051 if step >= 0 => steps(step).pcen = v.num.map(_ / 100.0)
          case 11012 if step >= 0 => steps(step).wind = v.num
          case 19003 =>
            radThreshold = v.num.map(thresholdIdx).getOrElse(-1)
            bearings.clear()
          case 5021 => v.num.foreach(bearings += _)
          case 19004 if step >= 0 && radThreshold >= 0 && bearings.nonEmpty =>
            v.num.foreach { m => // metres → km
              steps(step).radii(radThreshold)(quadIdx(bearings.head)) = m / 1000.0
            }
            bearings.clear()
          case _ =>
        }
      }
      steps.collect { case s if s.lat.isDefined && s.lon.isDefined =>
        // max_radius: flat-earth deg×111 distance from storm centre to
        // the max-wind location — the reference's own derivation
        // (tc_tracks_forecast.py `max_radius`), quirk preserved
        val maxRadiusKm = (s.latM, s.lonM) match {
          case (Some(lm), Some(om)) =>
            math.sqrt(math.pow(s.lat.get - lm, 2) + math.pow(s.lon.get - om, 2)) * 111.0
          case _ => Double.NaN
        }
        val r = s.radii
        org.apache.spark.sql.Row(sid, name, member, isEns,
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            forecastMicros / 1000000L + (s.h * 3600).toLong)),
          s.lat.get, s.lon.get,
          s.pcen.getOrElse(Double.NaN), 1010.0, Double.NaN,
          s.wind.getOrElse(Double.NaN), maxRadiusKm, s.h,
          r(0)(0), r(0)(1), r(0)(2), r(0)(3),
          r(1)(0), r(1)(1), r(1)(2), r(1)(3),
          r(2)(0), r(2)(1), r(2)(2), r(2)(3))
      }
    }
    // per-quadrant wind radii: thresholds 18/26/33 m/s are the
    // operational 34/50/64 kn surfaces; quadrant = start bearing
    val radiiCols = for {
      kt <- Seq("34", "50", "64")
      q <- Seq("ne", "se", "sw", "nw")
    } yield StructField(s"radius_${kt}kt_${q}_km", DoubleType)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("storm_id", StringType), StructField("name", StringType),
        StructField("ens_id", IntegerType), StructField("is_ensemble", BooleanType),
        StructField("time", TimestampType), StructField("lat", DoubleType),
        StructField("lon", DoubleType), StructField("central_pressure", DoubleType),
        StructField("environmental_pressure", DoubleType),
        StructField("radius_max_wind", DoubleType),
        StructField("max_sustained_wind", DoubleType),
        StructField("max_radius_km", DoubleType),
        StructField("time_offset_h", DoubleType)) ++ radiiCols))
  }

  /** S3/S4 head: GRIB2 fields as a long DataFrame, decoded on the
    * executors — `binaryFile` ships each (possibly bz2-wrapped) file
    * whole to one task and the from-scratch decoder flat-maps it to
    * (file, msg_idx, parameter, member, lead, point, lat, lon, value)
    * rows. NWP archives are many files of a few MB, so the file is the
    * natural parallel unit at any corpus size; downstream cube math
    * (`Rainfall.ensembleMedian` etc.) is ordinary relational Spark.
    * Unstructured grids (ICON template 3.101) carry NaN lat/lon —
    * their coordinates live in an external grid file by design. */
  def readGrib2(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        Grib2.read(Grib2.decompress(bytes)).iterator.zipWithIndex.flatMap {
          case (m, mi) =>
            val grid = m.grid
            m.values.iterator.zipWithIndex.map { case (v, i) =>
              val (lat, lon) = grid.map(_.latLon(i))
                .getOrElse((Double.NaN, Double.NaN))
              (path, mi, m.paramCategory, m.paramNumber, m.ensembleMember,
                m.forecastTime, i, lat, lon, v)
            }
        }
      }
      .toDF("path", "msg_idx", "param_category", "param_number", "member",
        "forecast_time", "point_idx", "lat", "lon", "value")
  }

  /** Processed-IBTrACS CSV → tracks DataFrame. Mirrors
    * `_read_ibtracs_csv_single` exactly: isotime is YYYYMMDDHH, vmax
    * stays in knots, and if ANY pcen is <= 0 every node's pressure is
    * replaced by the statistical estimate (the reference's
    * all-or-nothing rule, tc_tracks.py:1495-1500). */
  def readProcessedIbtracsCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(path)
      .select(
        col("ibtracsID").as("storm_id"),
        lit(0).as("ens_id"),
        to_timestamp(format_string("%010.0f", col("isotime").cast("double")),
          "yyyyMMddHH").as("time"),
        col("cgps_lat").cast("double").as("lat"),
        col("cgps_lon").cast("double").as("lon"),
        col("pcen").cast("double").as("central_pressure"),
        col("penv").cast("double").as("environmental_pressure"),
        col("rmax").cast("double").as("radius_max_wind"),
        col("vmax").cast("double").as("max_sustained_wind"),
        col("tint").cast("double").as("time_step"))
    val anyBad = min(col("central_pressure"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy("storm_id", "ens_id"))
    val estimated =
      lit(1026.3401) + lit(-0.05504) * col("lat") + lit(-0.03536) * col("lon") +
        lit(-0.7357) * col("max_sustained_wind")
    // _estimate_pressure's validity mask (tc_tracks.py:1660-1669): the estimate
    // only applies where vmax > 0 and lat/lon are not the -999/NaN sentinels;
    // unestimable nodes stay <= 0 and collapse to NaN in the final np.where.
    val vmaxOk = col("max_sustained_wind").isNotNull &&
      !isnan(col("max_sustained_wind")) && col("max_sustained_wind") > 0
    val latOk = col("lat").isNotNull && !isnan(col("lat")) && col("lat") > -999
    val lonOk = col("lon").isNotNull && !isnan(col("lon")) && col("lon") > -999
    raw.withColumn("central_pressure",
      when(anyBad <= 0,
        when(vmaxOk && latOk && lonOk && estimated > 0, estimated)
          .otherwise(lit(Double.NaN)))
        .otherwise(col("central_pressure")))
  }
}
