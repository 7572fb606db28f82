package graft

import org.apache.spark.sql.functions._

import graft.publish.{ImpactMap, Notify}

/** K6 impact-map client + K7 notification client: engine-relational
  * layers (join, fallback ladder, BoundaryNorm color classing, track
  * window) and deterministic JDK-only rendering/MIME building with
  * injected delivery. */
class PublishClientsSpec extends SparkTestBase {
  import spark.implicits._

  private def sq(x0: Double, y0: Double, s: Double): String =
    s"POLYGON (($x0 $y0, ${x0 + s} $y0, ${x0 + s} ${y0 + s}, $x0 ${y0 + s}, $x0 $y0))"

  private val admin = Seq(
    ("PH01", sq(120, 14, 1)), ("PH02", sq(121, 14, 1)), ("PH03", sq(122, 14, 1)))
    .toDF("adm3_pcode", "wkt")

  test("color classing follows the reference's BoundaryNorm bounds exactly") {
    val got = Seq(0.0, 0.5, 1.0, 2.9, 3.0, 4.9, 5.0, 7.4, 7.5, 9.9, 10.0, 50.0)
      .toDF("impact")
      .select(ImpactMap.colorClass($"impact"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq(
      "#ffffe5", "#ffffe5",             // [0, 1)
      "#fcae91", "#fcae91",             // [1, 3)
      "#fb6a4a", "#fb6a4a",             // [3, 5)
      "#de2d26", "#de2d26",             // [5, 7.5)
      "#a50f15", "#a50f15",             // [7.5, 10)
      "#a50f15", "#a50f15"))            // clamped above the top bound
  }

  test("municipality layer: distance fallback ladder and fillna(0)") {
    def impact(d1: Double, d2: Double) = Seq(
      ("PH01", 6.0, d1), ("PH02", 0.5, d2))
      .toDF("Mun_Code", "impact", "HAZ_dis_track_min")
    // near set non-empty → only dist<200 rows
    val near = ImpactMap.municipalityLayer(impact(150, 250), admin)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(near === Map("PH01" -> "#de2d26"))
    // no dist<200 → ladder falls to dist<300
    val mid = ImpactMap.municipalityLayer(impact(250, 290), admin)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(mid === Map("PH01" -> 6.0, "PH02" -> 0.5))
    // nothing within 300 → all admin rows, unmatched impact nulls → 0
    val all = ImpactMap.municipalityLayer(impact(400, 500), admin)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(all === Map("PH01" -> 6.0, "PH02" -> 0.5, "PH03" -> 0.0))
  }

  test("track layer keeps the reference's lon window (117, 128)") {
    val pts = Seq((14.0, 116.0), (14.5, 120.0), (15.0, 129.0))
      .toDF("lat", "lon")
    val got = ImpactMap.trackLayer(pts).collect().map(_.getDouble(1)).toSeq
    assert(got === Seq(120.0))
  }

  test("renderPng draws classed polygons and track points; PNG round-trips") {
    val impact = Seq(("PH01", 8.0, 50.0), ("PH02", 0.0, 60.0), ("PH03", 4.0, 70.0))
      .toDF("Mun_Code", "impact", "HAZ_dis_track_min")
    val track = Seq((14.5, 121.5)).toDF("lat", "lon")
    val path = java.nio.file.Files.createTempFile("graft_map", ".png").toString
    try {
      val (w, h) = ImpactMap.makeImpactMap(impact, admin, track, path, width = 300)
      assert(w === 300 && h === 100)  // 3x1 degree bbox keeps aspect
      val img = javax.imageio.ImageIO.read(new java.io.File(path))
      assert(img.getWidth === 300 && img.getHeight === 100)
      def rgbAt(lon: Double, lat: Double): Int = {
        val x = math.round((lon - 120.0) / 3.0 * 299).toInt
        val y = math.round((15.0 - lat) / 1.0 * 99).toInt
        img.getRGB(x, y) & 0xffffff
      }
      // polygon interiors carry their class colors
      assert(rgbAt(120.3, 14.3) === 0xa50f15)  // impact 8.0 → top band
      assert(rgbAt(122.5, 14.3) === 0xfb6a4a)  // impact 4.0 → [3,5)
      // the track point is a black disc at its center
      assert(rgbAt(121.5, 14.5) === 0x000000)
      // and our own decoder reads the artifact back (K6 meets x09 path)
      val dec = graft.multimodal.MultimodalOps.decodeImage(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      assert(dec.exists(d => d.width == 300 && d.height == 100))
    } finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
  }

  test("renderPng: polygon holes stay unfilled (even-odd winding)") {
    val wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    val path = java.nio.file.Files.createTempFile("graft_hole", ".png").toString
    try {
      ImpactMap.renderPng(Seq((wkt, "#a50f15")), Seq.empty, path, width = 100)
      val img = javax.imageio.ImageIO.read(new java.io.File(path))
      def rgbAt(lon: Double, lat: Double): Int =
        img.getRGB(math.round(lon / 10.0 * 99).toInt,
          math.round((10.0 - lat) / 10.0 * 99).toInt) & 0xffffff
      assert(rgbAt(2.0, 5.0) === 0xa50f15)   // ring area filled
      assert(rgbAt(5.0, 5.0) === 0xffffff)   // hole shows background
    } finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
  }

  test("buildEmail: deterministic MIME with HTML alternative and attachments") {
    val payload = Array[Byte](1, 2, 3, 4, 5)
    val msg = Notify.buildEmail("Typhoon DREF alert", "ibf@example.org",
      Seq("ops@example.org", "duty@example.org"), Seq("cc@example.org"),
      "<b>trigger reached</b>", Seq(("impact.csv", "a,b\n1,2".getBytes),
        ("map.png", payload)))
    assert(msg.contains("Subject: Typhoon DREF alert\r\n"))
    assert(msg.contains("To: ops@example.org, duty@example.org\r\n"))
    assert(msg.contains("CC: cc@example.org\r\n"))
    assert(msg.contains("""Content-Type: multipart/mixed; boundary="graft-mixed""""))
    assert(msg.contains("""Content-Type: multipart/alternative; boundary="graft-alt""""))
    assert(msg.contains("""Content-Type: text/csv; name="impact.csv""""))
    assert(msg.contains("""Content-Type: image/png; name="map.png""""))
    // the HTML body and attachment bytes round-trip through base64
    val b64Html = java.util.Base64.getEncoder.encodeToString(
      "<b>trigger reached</b>".getBytes("UTF-8"))
    assert(msg.contains(b64Html))
    assert(msg.contains(java.util.Base64.getEncoder.encodeToString(payload)))
    // deterministic: same inputs, same bytes
    assert(msg === Notify.buildEmail("Typhoon DREF alert", "ibf@example.org",
      Seq("ops@example.org", "duty@example.org"), Seq("cc@example.org"),
      "<b>trigger reached</b>", Seq(("impact.csv", "a,b\n1,2".getBytes),
        ("map.png", payload))))
  }

  test("buildEmail: CRLF can't inject headers, non-ASCII subject B-encodes") {
    val msg = Notify.buildEmail("alert\r\nBcc: evil@x", "ibf@example.org",
      Seq("ops@example.org"), Seq.empty, "<p>hi</p>",
      Seq(("na\"me\r\n.csv", "a".getBytes)))
    assert(msg.contains("Subject: alert Bcc: evil@x\r\n"))
    assert(!msg.contains("\r\nBcc:"))
    assert(msg.contains("""filename="name.csv""""))
    val utf = Notify.buildEmail("Bagyo ⚠ alerto", "ibf@example.org",
      Seq("ops@example.org"), Seq.empty, "<p>hi</p>")
    val enc = "=?utf-8?B?" + java.util.Base64.getEncoder.encodeToString(
      "Bagyo ⚠ alerto".getBytes("UTF-8")) + "?="
    assert(utf.contains(s"Subject: $enc\r\n"))
    // the whole message stays 7-bit clean
    assert(utf.forall(c => c < 128))
  }

  test("sendEmail delivers to + cc through the injected transport with retry") {
    var sent = Vector.empty[(Seq[String], String)]
    var failures = 1
    Notify.sendEmail((rcpt, msg) => {
      if (failures > 0) { failures -= 1; sys.error("smtp 421, try again") }
      sent :+= ((rcpt, msg))
    }, "s", "from@x", Seq("a@x"), Seq("b@x"), "<p>hi</p>",
      maxAttempts = 3, baseDelayMs = 0)
    assert(sent.length === 1)
    assert(sent.head._1 === Seq("a@x", "b@x"))
    assert(sent.head._2.contains("To: a@x"))
  }

  test("datalake client: json artifacts, deterministic zip, double upload") {
    import graft.publish.Datalake
    val dir = java.nio.file.Files.createTempDirectory("graft_out")
    def write(name: String, body: String): Unit =
      java.nio.file.Files.write(dir.resolve(name), body.getBytes)
    write("b_payload.json", """{"b":1}""")
    write("a_payload.json", """{"a":1}""")
    write("impact.csv", "a,b\n1,2")

    var puts = Vector.empty[(String, Array[Byte])]
    val n = Datalake.putJsonArtifacts(dir.toString, "TYPH2024",
      (p, b) => puts :+= ((p, b)))
    assert(n === 2)
    // json-only, sorted names, reference's remote layout
    assert(puts.map(_._1) === Vector(
      "output/forecast/TYPH2024/a_payload.json",
      "output/forecast/TYPH2024/b_payload.json"))
    assert(new String(puts.head._2) === """{"a":1}""")

    puts = Vector.empty
    Datalake.putModelOutputs(dir.toString, "2024-01-02T09:30:00Z",
      (p, b) => puts :+= ((p, b)))
    assert(puts.map(_._1) === Vector(
      "ibf_model_results/20240102T09_model_outputs.zip",
      "ibf_model_results/model_outputs.zip"))
    assert(puts(0)._2.toSeq === puts(1)._2.toSeq)
    // the archive holds every artifact (not itself), name-sorted
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(puts.head._2))
    val entries = Iterator.continually(zis.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toVector
    assert(entries === Vector("a_payload.json", "b_payload.json", "impact.csv"))
    // deterministic: zipping again yields identical bytes
    val again = {
      val p = dir.resolve("model_outputs.zip")
      java.nio.file.Files.delete(p)
      Datalake.zipDir(dir.toString, p.toString)
      java.nio.file.Files.readAllBytes(p)
    }
    assert(again.toSeq === puts.head._2.toSeq)
  }

  test("mime types cover the reference's artifact set") {
    assert(Notify.mimeType("x.PNG") === "image/png")
    assert(Notify.mimeType("a.b.csv") === "text/csv")
    assert(Notify.mimeType("payload.json") === "application/json")
    assert(Notify.mimeType("weird.bin") === "application/octet-stream")
  }
}
