package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.geo.SpatialJoin
import graft.impact.ImpactModel
import graft.publish.Sinks
import graft.sources.GeoSources
import graft.util.Retry

class UtilSourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("retry: succeeds after transient failures, linear backoff schedule") {
    var delays = Vector.empty[Long]
    val got = Retry.withLinearBackoff(maxAttempts = 5, baseDelayMs = 10,
      sleep = d => delays :+= d) { attempt =>
      if (attempt < 3) throw new RuntimeException("transient") else "ok"
    }
    assert(got == "ok")
    assert(delays == Vector(10L, 20L))   // 10*1, 10*2
    val ex = intercept[RuntimeException] {
      Retry.withLinearBackoff(maxAttempts = 2, baseDelayMs = 1, sleep = _ => ())(
        _ => throw new RuntimeException("always"))
    }
    assert(ex.getMessage.contains("after 2 attempts"))
  }

  test("S5 GeoJSON polygons land as WKT and drive the spatial join") {
    val dir = Files.createTempDirectory("graft_geojson")
    val geojson =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"adm3_pcode":"PH001"},
        | "geometry":{"type":"Polygon","coordinates":[[[122,13],[123,13],[123,14],[122,14],[122,13]]]}},
        |{"type":"Feature","properties":{"adm3_pcode":"PH002"},
        | "geometry":{"type":"Polygon","coordinates":[[[123,13],[124,13],[124,14],[123,14],[123,13]]]}}
        |]}""".stripMargin
    Files.writeString(dir.resolve("admin.geojson"), geojson)
    val polys = GeoSources.readGeoJson(spark, dir.toString)
    val rows = polys.orderBy("admin_code").collect()
    assert(rows.length == 2)
    assert(rows.head.getString(1).startsWith("POLYGON ((122 13, 123 13"))
    // WKT parses and contains the right points end-to-end
    val pts = Seq((1L, 13.5, 122.5), (2L, 13.5, 123.5)).toDF("centroid_id", "lat", "lon")
    val map = SpatialJoin.centroidAdminMap(pts, polys)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(map == Map(1L -> "PH001", 2L -> "PH002"))
  }

  test("K1 single-file CSV sink writes one part file with header") {
    val dir = Files.createTempDirectory("graft_csv_out").resolve("out").toString
    Sinks.writeSingleCsv(Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1)
    val content = Files.readString(parts.head.toPath)
    assert(content.startsWith("id,v"))
  }

  test("K4 payload POST retries transient failures per payload") {
    val payloads = Seq("{\"a\":1}", "{\"b\":2}").toDF("payload")
    var posted = Vector.empty[String]
    var failures = 1
    Sinks.postPayloads(payloads, body => {
      if (failures > 0 && body.contains("a")) { failures -= 1; throw new RuntimeException("503") }
      posted :+= body
    }, maxAttempts = 3, baseDelayMs = 0)
    assert(posted.toSet == Set("{\"a\":1}", "{\"b\":2}"))
  }

  test("J8/F8 training prep: year join + label hygiene") {
    val training = Seq(
      ("molave2020", 40.0, 10.0),   // vmax>25 → dmg/growth
      ("haima2016", 10.0, 5.0),     // vmax<25 → 0
      ("unknown2019", 25.0, 3.0))   // exactly 25 → null
      .toDF("typhoon", "HAZ_v_max", "DAM_perc_dmg_raw")
    val growth = Seq(("2020", 2.0), ("2016", 1.5), ("2019", 1.0))
      .toDF("year", "growth_factor")
    val got = ImpactModel.prepareTraining(training, growth)
      .select("typhoon", "DAM_perc_dmg").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got("molave2020") == Some(5.0))
    assert(got("haima2016") == Some(0.0))
    assert(got("unknown2019") == None)
  }
}
