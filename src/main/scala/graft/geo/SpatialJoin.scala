package graft.geo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.WKTReader

/** J1: grid-point → admin-polygon spatial join (SURVEY.md §2.4).
  *
  * The reference computes `sjoin(grid, admin)` ONCE in `__init__`
  * (forecast_process.py:99-121) and reuses the result for every member
  * and storm — the same trick here: build a static centroid→admin map
  * with one broadcast JTS pass, persist it, and every later "spatial"
  * operation becomes a plain equi-join on `centroid_id`.
  *
  * Polygons ride along as WKT strings; at ~1.6k municipalities the
  * prepared-geometry array broadcast is a few MB. The UDF is only on
  * this one bootstrap path — everything downstream is codegen'd
  * equi-joins, which is what scales to 100 TB.
  */
object SpatialJoin {

  /** Build the centroid→admin map: points (centroid_id, lat, lon) ×
    * polygons (admin_code, wkt) → (centroid_id, admin_code). Points in
    * no polygon are dropped (the reference's sjoin+dropna ≙ inner).
    * First matching polygon wins, in ascending admin_code order —
    * deterministic, unlike geopandas sjoin's index order. */
  /** WKT polygons parsed+prepared lazily once per executor JVM
    * (@transient lazy val re-materializes after deserialization). */
  private class PolyIndex(polys: Array[(String, String)]) extends Serializable {
    @transient lazy val prepared: Array[(String, PreparedGeometry)] = {
      val reader = new WKTReader()
      polys.map { case (code, wkt) =>
        (code, PreparedGeometryFactory.prepare(reader.read(wkt)))
      }
    }
    @transient lazy val factory = new GeometryFactory()
    def firstContaining(lat: Double, lon: Double): Option[String] = {
      val pt = factory.createPoint(new Coordinate(lon, lat))
      prepared.collectFirst { case (code, g) if g.contains(pt) => code }
    }
  }

  def centroidAdminMap(points: DataFrame, polygons: DataFrame): DataFrame = {
    val polys: Array[(String, String)] = polygons
      .select("admin_code", "wkt").orderBy("admin_code")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val idx = new PolyIndex(polys)
    val containsUdf = udf((lat: Double, lon: Double) => idx.firstContaining(lat, lon))
    points
      .withColumn("admin_code", containsUdf(col("lat"), col("lon")))
      .where(col("admin_code").isNotNull)
      .select("centroid_id", "admin_code")
  }

  /** A7: zonal statistics — mean raster value per admin zone per key
    * (e.g. timestep), via the precomputed centroid→admin map. The
    * raster is long-format (centroid_id, <keys...>, value). */
  def zonalMean(raster: DataFrame, centroidAdmin: DataFrame,
                keys: Seq[String]): DataFrame =
    raster.join(broadcast(centroidAdmin), "centroid_id")
      .groupBy((Seq("admin_code") ++ keys).map(col): _*)
      .agg(avg("value").as("zonal_mean"))

  /** A8: max over timesteps of the zonal mean per admin zone. */
  def zonalMaxOverTime(raster: DataFrame, centroidAdmin: DataFrame,
                       timeKey: String = "time"): DataFrame =
    zonalMean(raster, centroidAdmin, Seq(timeKey))
      .groupBy("admin_code")
      .agg(max("zonal_mean").as("zonal_max"))
}
