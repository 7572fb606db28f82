package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.TrackSources

class TrackSourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("S2 BUFR line parse: ffill subset state + pivot descriptors into track rows") {
    // two subsets (ensemble members), two timesteps each — the shape of
    // a pybufrkit flat render after line tokenization
    val lines = Seq(
      // (file, line_no, subset, code, value)
      ("f1", 1, "1", null, null),
      ("f1", 2, null, "001027", "HAGIBIS"),
      ("f1", 25, null, "001025", "09W"),
      ("f1", 30, null, "004024", "0"),
      ("f1", 40, null, "005002", "14.1"), ("f1", 50, null, "006002", "125.0"),
      ("f1", 60, null, "010051", "96000"), ("f1", 70, null, "011012", "45.5"),
      ("f1", 80, null, "004024", "6"),
      ("f1", 90, null, "005002", "14.6"), ("f1", 100, null, "006002", "124.3"),
      ("f1", 110, "2", null, null),
      ("f1", 120, null, "001027", "HAGIBIS"),
      ("f1", 130, null, "004024", "0"),
      ("f1", 140, null, "005002", "13.9"), ("f1", 150, null, "006002", "125.2"))
      .toDF("file", "line_no", "subset", "code", "value")
    val got = TrackSources.parseBufrLines(lines).cache()
    assert(got.count() == 3)
    val s1t0 = got.where($"ens_id_raw" === "1" && $"step_idx" === 1).collect().head
    assert(s1t0.getAs[Double]("lat") == 14.1)
    assert(s1t0.getAs[Double]("central_pressure") == 96000.0)
    assert(s1t0.getAs[String]("name") == "HAGIBIS")
    assert(s1t0.getAs[String]("storm_sid") == "09W")
    val s1t1 = got.where($"ens_id_raw" === "1" && $"step_idx" === 2).collect().head
    assert(s1t1.getAs[Double]("lon") == 124.3)
    val s2 = got.where($"ens_id_raw" === "2").collect().head
    assert(s2.getAs[Double]("lat") == 13.9)
    got.unpersist()
  }

  test("S8 scraper CSV with declared schema converts to the common track schema") {
    val dir = Files.createTempDirectory("graft_csv")
    val csv = "YYYYMMDDHH,LON,LAT,VMAX,GUST,STORMNAME\n" +
      "2024010100,125.0,14.1,45.0,60.0,HAGIBIS\n" +
      "2024010106,124.3,14.6,50.0,65.0,HAGIBIS\n"
    Files.writeString(dir.resolve("track.csv"), csv)
    val got = TrackSources.readScraperCsv(spark, dir.toString).orderBy("time").collect()
    assert(got.length == 2)
    assert(got.head.getAs[java.sql.Timestamp]("time") ==
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(got.head.getAs[Double]("max_sustained_wind") == 45.0)
    assert(got.head.getAs[String]("is_ensemble") == "False")
    assert(got.head.getAs[String]("basin") == "W - North West Pacific")
  }

  test("ingest filters: basin + numeric-name exclusion") {
    val tracks = Seq(
      ("HAGIBIS", "W - North West Pacific"),
      ("02W", "W - North West Pacific"),
      ("KATRINA", "NA - North Atlantic"))
      .toDF("name", "basin")
      .withColumn("max_sustained_wind", lit("35.5"))
    val got = TrackSources.cleanTracks(tracks).select("name").collect().map(_.getString(0))
    assert(got.toSeq == Seq("HAGIBIS"))
  }
}
