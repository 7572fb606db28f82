package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Track ingestion (SURVEY.md §2.1 S2/S6/S8).
  *
  * The reference decodes ECMWF BUFR through pybufrkit's flat text
  * render, then line-parses descriptor codes, forward-filling parse
  * state (subset id, model sign) down the line stream
  * (tc_tracks_forecast.py:187-337). The Spark-native form: land the
  * flat render as a lines table, rebuild state with window ffill (W2),
  * pivot descriptor codes into columns. FTP/HTTP transport stays a
  * driver-side adapter (§2.14) — the engine starts at the landed file.
  */
object TrackSources {

  /** The common tracks schema every provider converges to
    * (tc_tracks_forecast.py:296-329): one row per (storm, member,
    * timestep). */
  val trackSchema: StructType = StructType(Seq(
    StructField("storm_id", StringType), StructField("name", StringType),
    StructField("ens_id", IntegerType), StructField("is_ensemble", StringType),
    StructField("time", TimestampType), StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("max_sustained_wind", DoubleType),
    StructField("central_pressure", DoubleType),
    StructField("radius_max_wind", DoubleType),
    StructField("environmental_pressure", DoubleType),
    StructField("basin", StringType)))

  /** BUFR descriptor codes used by the reference
    * (tc_tracks_forecast.py:261-290, 380-391: 001025 storm id,
    * 001091 ensemble number, 001092 ensemble type, 008005
    * significance). */
  val DescriptorToField: Map[String, String] = Map(
    "005002" -> "lat", "006002" -> "lon",
    "010051" -> "central_pressure", "011012" -> "max_sustained_wind",
    "004024" -> "time_offset_h", "001027" -> "name",
    "001025" -> "storm_sid", "001092" -> "ens_type",
    "001091" -> "ens_id", "008005" -> "meaning_sgn")

  /** S2: reconstruct track rows from a decoded BUFR flat render.
    * Input lines: (file, line_no, subset, code, value) where `subset`
    * is only present on subset-header lines — exactly the shape the
    * reference's line parser sees; `null` elsewhere.
    *
    * W2 ffill rebuilds per-line subset state; rows pivot by
    * (file, subset, time_offset) into the common schema. */
  def parseBufrLines(lines: DataFrame): DataFrame = {
    val w = Window.partitionBy("file").orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withState = lines
      .withColumn("subset_f", last(col("subset"), ignoreNulls = true).over(w))
    // group descriptor observations: a new timestep begins at each
    // time-offset line (004024)
    val wSub = Window.partitionBy("file", "subset_f").orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // storm name / sid / ensemble type are subset-level metadata
    // appearing before the first timestep — forward-fill, don't pivot
    val metaCodes = Seq("001027" -> "name_f", "001025" -> "sid_f", "001092" -> "etype_f")
    val withStep = metaCodes.foldLeft(withState) { case (df, (code, colName)) =>
      df.withColumn(colName,
        last(when(col("code") === code, col("value")), ignoreNulls = true).over(wSub))
    }.withColumn("step_idx",
        sum(when(col("code") === "004024", 1).otherwise(0)).over(wSub))
    val stepCodes = DescriptorToField.keys.toSeq
      .filterNot(Seq("001027", "001025", "001092").contains).sorted
    withStep
      .where(col("code").isin(stepCodes: _*))
      // metadata columns are constant within a subset by the time any
      // step line appears, so they ride along as grouping keys
      .groupBy("file", "subset_f", "name_f", "sid_f", "etype_f", "step_idx")
      .pivot("code", stepCodes)
      .agg(first("value"))
      .where(col("004024").isNotNull)   // only groups anchored at a timestep
      .select(
        col("file"), col("subset_f").as("ens_id_raw"), col("step_idx"),
        col("name_f").as("name"), col("sid_f").as("storm_sid"),
        col("etype_f").as("ens_type"),
        col("005002").cast("double").as("lat"),
        col("006002").cast("double").as("lon"),
        col("010051").cast("double").as("central_pressure"),
        col("011012").cast("double").as("max_sustained_wind"),
        col("004024").cast("double").as("time_offset_h"))
  }

  /** S8: the scrapers' common CSV
    * (`YYYYMMDDHH,LON,LAT,VMAX,GUST,STORMNAME` — Jtcw_data.py:16-63)
    * with a DECLARED schema + FAILFAST (no silent NaN coercion),
    * converted to the common tracks schema. */
  val scraperCsvSchema: StructType = StructType(Seq(
    StructField("YYYYMMDDHH", StringType), StructField("LON", DoubleType),
    StructField("LAT", DoubleType), StructField("VMAX", DoubleType),
    StructField("GUST", DoubleType), StructField("STORMNAME", StringType)))

  def readScraperCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true").option("mode", "FAILFAST")
      .schema(scraperCsvSchema)
      .csv(path)
      .select(
        col("STORMNAME").as("storm_id"), col("STORMNAME").as("name"),
        lit(0).as("ens_id"), lit("False").as("is_ensemble"),
        // F10: parse YYYYMMDDHH[MM] (forecast_process.py:311,687)
        to_timestamp(rpad(col("YYYYMMDDHH"), 12, "0"), "yyyyMMddHHmm").as("time"),
        col("LAT").as("lat"), col("LON").as("lon"),
        col("VMAX").as("max_sustained_wind"),
        lit(null).cast("double").as("central_pressure"),
        lit(null).cast("double").as("radius_max_wind"),
        lit(1010.0).as("environmental_pressure"),
        lit("W - North West Pacific").as("basin"))

  /** W10: latest forecast cycle selection — max cycle id then semi-join
    * (tc_tracks_forecast.py:147-150 sorts remote dirs desc, takes
    * first). */
  def latestCycle(files: DataFrame, cycleCol: String = "cycle"): DataFrame = {
    val latest = files.agg(max(col(cycleCol)).as(cycleCol))
    files.join(latest, Seq(cycleCol), "left_semi")
  }

  /** S2 completion: absolute timestamps from the forecast base time +
    * per-step hour offsets (the BUFR 004024 descriptor). */
  def withAbsoluteTime(parsed: DataFrame, forecastTime: java.sql.Timestamp): DataFrame =
    parsed.withColumn("time",
      timestamp_seconds(unix_timestamp(lit(forecastTime)) +
        (col("time_offset_h") * 3600).cast("long")))

  /** P1/P2/P7 ingest filters (forecast_process.py:182,197-213,291):
    * basin, numeric-name exclusion, 'None' → null coercion quirk. */
  def cleanTracks(tracks: DataFrame): DataFrame =
    tracks
      .where(col("basin") === "W - North West Pacific")
      .where(!col("name").rlike("^[0-9]"))
      .withColumn("max_sustained_wind",
        when(col("max_sustained_wind") === "None", lit(null))
          .otherwise(col("max_sustained_wind")).cast("double"))
}
