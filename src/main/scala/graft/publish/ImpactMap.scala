package graft.publish

import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color, RenderingHints}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Geometry, Polygon}
import org.locationtech.jts.io.WKTReader

/** K6: the impact-map client — the engine-side twin of the reference's
  * `makeMaps` (forecast_process.py:1772-1871). The DATA of the map is
  * computed relationally (join, distance filter with the reference's
  * fallback ladder, fillna, the BoundaryNorm color classing, the track
  * window); rendering is a thin JDK-only raster pass (Graphics2D +
  * ImageIO — the same zero-dependency stance as the multimodal
  * decoder) over the collected layers, which are dimension-sized by
  * contract (~1.6k municipality polygons).
  *
  * Palette and class bounds are the reference's exactly
  * (forecast_process.py:1817-1820): bounds [0,1,3,5,7.5,10] over the
  * ListedColormap ['#ffffe5','#fcae91','#fb6a4a','#de2d26','#a50f15'].
  */
object ImpactMap {

  /** The reference's BoundaryNorm bounds and 5-color palette. */
  val Bounds: Seq[Double] = Seq(0.0, 1.0, 3.0, 5.0, 7.5, 10.0)
  val Palette: Seq[String] =
    Seq("#ffffe5", "#fcae91", "#fb6a4a", "#de2d26", "#a50f15")

  /** BoundaryNorm color classing as a Column: impact in [b_i, b_{i+1})
    * → palette(i), clamped at both ends (matplotlib's BoundaryNorm
    * with ncolors = len(bounds)-1). */
  def colorClass(impact: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // fold the windows in reverse so the lowest bound tests OUTERMOST:
    // when(<1, c0).otherwise(when(<3, c1).otherwise(...)), clamped to
    // the last color above the top bound
    Bounds.sliding(2).zipWithIndex.toSeq.reverse.foldLeft(lit(Palette.last)) {
      case (acc, (Seq(_, hi), i)) => when(impact < hi, Palette(i)).otherwise(acc)
    }
  }

  /** The municipality layer: admin polygons left-joined with impact on
    * the pcode (forecast_process.py:1799), restricted by the
    * reference's fallback ladder — municipalities within 200 km of the
    * track; if none, within 300 km; if still none, all
    * (forecast_process.py:1803-1812) — then fillna(0) and color-classed.
    * Output (pcode, wkt, impact, fill_color). */
  def municipalityLayer(impact: DataFrame, admin: DataFrame,
                        pcodeCol: String = "adm3_pcode",
                        wktCol: String = "wkt",
                        impactPcodeCol: String = "Mun_Code",
                        impactCol: String = "impact",
                        distCol: String = "HAZ_dis_track_min"): DataFrame = {
    val joined = admin
      .select(col(pcodeCol).as("pcode"), col(wktCol).as("wkt"))
      .join(broadcast(impact.select(col(impactPcodeCol).as("pcode"),
          col(impactCol).as("impact"), col(distCol).as("dist"))),
        Seq("pcode"), "left")
    val near = joined.where(col("dist") < 200)
    val mid = joined.where(col("dist") < 300)
    // the ladder's counts run over a dimension-sized table (driver
    // checks are the reference's own semantics, py:1803-1812)
    val chosen =
      if (!near.isEmpty) near
      else if (!mid.isEmpty) mid
      else joined
    chosen.na.fill(0.0, Seq("impact"))
      .withColumn("fill_color", colorClass(col("impact")))
      .select("pcode", "wkt", "impact", "fill_color")
  }

  /** The track layer: points inside the reference's lon window
    * (117, 128) (forecast_process.py:1832-1833), buffered 0.05° at
    * render time. Output (lat, lon) ordered by time when present. */
  def trackLayer(track: DataFrame, latCol: String = "lat",
                 lonCol: String = "lon"): DataFrame =
    track.where(col(lonCol) > 117 && col(lonCol) < 128)
      .select(col(latCol).cast("double").as("lat"),
        col(lonCol).cast("double").as("lon"))

  private def parseColor(hex: String): Color =
    new Color(Integer.parseInt(hex.drop(1), 16))

  /** Render the collected layers to a PNG at `path` (equirectangular
    * lon/lat → pixel mapping over the polygon bounding box, the
    * approximation the reference's unprojected plot uses). Returns
    * (width, height). Polygon holes and multipolygons render ring by
    * ring; the track draws as filled circles of `bufferDeg` degrees
    * (py:1834 `buffer(0.05)`). */
  def renderPng(municipalities: Seq[(String, String)],
                trackPts: Seq[(Double, Double)],
                path: String, width: Int = 1200,
                bufferDeg: Double = 0.05): (Int, Int) = {
    require(municipalities.nonEmpty, "impact map: no polygons to draw")
    val reader = new WKTReader()
    val geoms: Seq[(Geometry, Color)] = municipalities.map { case (wkt, hex) =>
      (reader.read(wkt), parseColor(hex))
    }
    val env = geoms.map(_._1.getEnvelopeInternal).reduce { (a, b) =>
      val e = new org.locationtech.jts.geom.Envelope(a); e.expandToInclude(b); e
    }
    val height = math.max(1,
      math.round(width * env.getHeight / math.max(env.getWidth, 1e-9)).toInt)
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_OFF)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, width, height)
      def px(lon: Double): Int =
        math.round((lon - env.getMinX) / env.getWidth * (width - 1)).toInt
      def py(lat: Double): Int = // lat grows north, pixel rows grow south
        math.round((env.getMaxY - lat) / env.getHeight * (height - 1)).toInt
      def drawPolygon(p: Polygon, fill: Color): Unit = {
        // even-odd winding: interior rings (holes) subtract from the
        // exterior fill instead of being painted over
        val shape = new java.awt.geom.Path2D.Double(
          java.awt.geom.Path2D.WIND_EVEN_ODD)
        def addRing(cs: Array[org.locationtech.jts.geom.Coordinate]): Unit = {
          shape.moveTo(px(cs(0).x).toDouble, py(cs(0).y).toDouble)
          cs.drop(1).foreach(c => shape.lineTo(px(c.x).toDouble, py(c.y).toDouble))
          shape.closePath()
        }
        addRing(p.getExteriorRing.getCoordinates)
        (0 until p.getNumInteriorRing)
          .foreach(i => addRing(p.getInteriorRingN(i).getCoordinates))
        g.setColor(fill)
        g.fill(shape)
        g.setColor(new Color(0x96, 0x96, 0x96)) // the reference's '#969696' edges
        g.setStroke(new BasicStroke(1f))
        g.draw(shape)
      }
      geoms.foreach { case (geom, color) =>
        (0 until geom.getNumGeometries).foreach { i =>
          geom.getGeometryN(i) match {
            case p: Polygon => drawPolygon(p, color)
            case _ => () // points/lines in the admin file carry no area
          }
        }
      }
      g.setColor(Color.BLACK)
      val rPx = math.max(1, math.round(bufferDeg / env.getWidth * (width - 1)).toInt)
      trackPts.foreach { case (lat, lon) =>
        g.fillOval(px(lon) - rPx, py(lat) - rPx, 2 * rPx, 2 * rPx)
      }
    } finally g.dispose()
    javax.imageio.ImageIO.write(img, "png", new java.io.File(path))
    (width, height)
  }

  /** The full K6 client: layers → collect → render → PNG path, the
    * counterpart of `fig.savefig(...houseing_damage.png)` (py:1870). */
  def makeImpactMap(impact: DataFrame, admin: DataFrame, track: DataFrame,
                    path: String, width: Int = 1200): (Int, Int) = {
    val polys = municipalityLayer(impact, admin).collect()
      .map(r => (r.getAs[String]("wkt"), r.getAs[String]("fill_color"))).toSeq
    val pts = trackLayer(track).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    renderPng(polys, pts, path, width)
  }
}
