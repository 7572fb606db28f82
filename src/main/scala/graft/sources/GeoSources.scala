package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5: GeoJSON admin-boundary ingestion (SURVEY.md §2.1; reference
  * reads admin3 polygons with geopandas at forecast_process.py:87-89).
  *
  * GeoJSON FeatureCollections land via `spark.read.json` (multiLine);
  * features explode into rows and coordinates serialize to WKT — the
  * engine-wide geometry interchange (geo.SpatialJoin consumes WKT).
  * Handles Polygon features (admin-3 boundaries are polygons);
  * MultiPolygon sources should be pre-split (schema inference cannot
  * mix 3- and 4-level coordinate nesting in one file).
  */
object GeoSources {

  /** Read a GeoJSON FeatureCollection → (admin_code, wkt).
    * `codeProperty` names the feature property carrying the pcode. */
  def readGeoJson(spark: SparkSession, path: String,
                  codeProperty: String = "adm3_pcode"): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val features = raw.select(explode(col("features")).as("f"))
    val geomType = col("f.geometry.type")
    // Polygon coordinates: ring[point[lon,lat]]; serialize ring 0 (the
    // shell) — holes are rare in admin data and ignored here, like the
    // reference's buffer(0) normalization path.
    def ringToWkt(ring: org.apache.spark.sql.Column) =
      concat(lit("("),
        concat_ws(", ", transform(ring,
          pt => concat(element_at(pt, 1).cast("string"), lit(" "),
            element_at(pt, 2).cast("string")))),
        lit(")"))
    features.select(
      col(s"f.properties.$codeProperty").as("admin_code"),
      when(geomType === "Polygon",
        concat(lit("POLYGON "),
          concat(lit("("), ringToWkt(element_at(col("f.geometry.coordinates"), 1)), lit(")"))))
        .otherwise(lit(null)).as("wkt"))
      .where(col("wkt").isNotNull && col("admin_code").isNotNull)
  }
}
