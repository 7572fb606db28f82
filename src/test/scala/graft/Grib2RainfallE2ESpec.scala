package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import org.apache.spark.sql.functions._

import graft.rain.Rainfall
import graft.sources.{ClimadaSources, Grib2}

/** The decoder→relational SEAM, end to end on a GEFS-`pgrb2a`-shaped
  * fixture (reference Rainfall_data.py:40-122 reads
  * `geprcp.t*.pgrb2a.0p50.bc_{06,24}h` and medians the ensemble):
  * raw `.grib2.bz2` bytes → ClimadaSources.readGrib2 →
  * Rainfall.ensembleMedian → withCellId → adminRainfall, asserted
  * against values computed independently in plain Scala from the same
  * synthetic field formula.
  *
  * Fixture shape mirrors the real product files: regular 0.5° lat/lon
  * grid (template 3.0), APCP (discipline 0, category 1, parameter 8),
  * one message per ensemble member with product template 4.11
  * (individual ens member + accumulation interval) packed with the
  * complex template 5.2, plus a 4.8 non-ensemble control message —
  * the templates GEFS precip products actually use. Integer-valued
  * fields with E=D=0 make complex packing lossless, so every
  * comparison is exact.
  */
class Grib2RainfallE2ESpec extends SparkTestBase {

  private val Ni = 4
  private val Nj = 3
  private val NPoints = Ni * Nj
  private val Members = 1 to 5
  private val LeadHours = Seq(6, 12)

  /** Synthetic APCP field: deterministic, integer, < 256. */
  private def fieldValue(member: Int, lead: Int, point: Int): Int =
    (member * 7 + point * 3) % 50 + (lead / 6) * 10

  // ---- GRIB2 encoding (per WMO FM-92, independent of the decoder) ----

  private final class Builder {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Builder = { out.write(v & 0xFF); this }
    def u16(v: Int): Builder = { u8(v >> 8); u8(v) }
    def u32(v: Long): Builder = { u16((v >> 16).toInt); u16(v.toInt) }
    def u64(v: Long): Builder = { u32(v >> 32); u32(v) }
    def f32(v: Float): Builder = u32(java.lang.Float.floatToIntBits(v))
    def bytes: Array[Byte] = out.toByteArray
  }

  private def section(num: Int, body: Builder => Unit): Array[Byte] = {
    val b = new Builder
    body(b)
    val content = b.bytes
    val h = new Builder
    h.u32(content.length + 5).u8(num)
    h.out.write(content, 0, content.length)
    h.bytes
  }

  /** Grid template 3.0: Ni×Nj regular lat/lon, 0.5°, lat1=15N lon1=120E,
    * scan mode 0 (+i, −j: north row first). */
  private def section3: Array[Byte] = section(3, b => {
    b.u8(0).u32(NPoints).u8(0).u8(0).u16(0)        // src, npoints, tmpl 3.0
      .u8(6).u8(0).u32(0).u8(0).u32(0).u8(0).u32(0) // earth shape block
      .u32(Ni).u32(Nj)
      .u32(0).u32(0)                                // basic angle/subdiv
      .u32(15000000L).u32(120000000L)               // lat1, lon1 (1e-6 deg)
      .u8(0x30)                                     // res/component flags
      .u32(15000000L - (Nj - 1) * 500000L)          // lat2
      .u32(120000000L + (Ni - 1) * 500000L)         // lon2
      .u32(500000L).u32(500000L)                    // Di, Dj
      .u8(0)                                        // scan mode
  })

  /** Product template 4.11 (ensemble member + statistical processing):
    * APCP, hour unit, given lead, perturbation `member` of 5. */
  private def section4Ens(member: Int, lead: Int): Array[Byte] =
    section(4, b => {
      b.u16(0).u16(11)
        .u8(1).u8(8)                 // moisture / APCP
        .u8(2).u8(0).u8(0)           // generating process
        .u16(0).u8(0)                // cutoff
        .u8(1).u32(lead)             // hours, forecast time
        .u8(1).u8(0).u32(0)          // surface 1: ground
        .u8(255).u8(0).u32(0)        // surface 2: none
        .u8(3).u8(member).u8(Members.size) // ens type, perturbation, n
        .u16(2026).u8(1).u8(1).u8(lead).u8(0).u8(0) // interval end
        .u8(1).u32(0)                // 1 range, 0 missing
        .u8(1).u8(2).u8(1).u32(6).u8(255).u32(0)    // accum over 6h
    })

  /** Product template 4.8 — the non-ensemble statistical variant some
    * pgrb2a products use (control / derived fields). */
  private def section4Control(lead: Int): Array[Byte] =
    section(4, b => {
      b.u16(0).u16(8)
        .u8(1).u8(8).u8(2).u8(0).u8(0).u16(0).u8(0)
        .u8(1).u32(lead)
        .u8(1).u8(0).u32(0).u8(255).u8(0).u32(0)
        .u16(2026).u8(1).u8(1).u8(lead).u8(0).u8(0)
        .u8(1).u32(0)
        .u8(1).u8(2).u8(1).u32(6).u8(255).u32(0)
    })

  private final class BitWriter {
    private var acc = 0L; private var nbits = 0
    val out = new ByteArrayOutputStream()
    def write(v: Long, w: Int): Unit = {
      var i = w - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nbits += 1
        if (nbits == 8) { out.write(acc.toInt); acc = 0; nbits = 0 }
        i -= 1
      }
    }
    def align(): Unit = while (nbits != 0) write(0, 1)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** Section 5 template 5.2 + matching section 7: one group of NPoints
    * 8-bit values, R=0 E=0 D=0 (lossless for ints < 256). */
  private def sections57(vals: Seq[Int]): (Array[Byte], Array[Byte]) = {
    val s5 = section(5, b => {
      b.u32(vals.length).u16(2)
        .f32(0f).u16(0).u16(0).u8(8) // R, E, D, 8 bits per group ref
        .u8(0).u8(1).u8(0)           // field type, split method, missing mgmt
        .u32(0).u32(0)               // missing substitutes
        .u32(1)                      // NG = 1
        .u8(8).u8(0)                 // width ref 8, 0 bits per width
        .u32(0).u8(1)                // length ref 0, increment 1
        .u32(vals.length)            // true length of last group
        .u8(4)                       // bits per scaled group length
    })
    val w = new BitWriter
    w.write(0, 8); w.align()         // group reference (NG=1)
    w.align()                        // widths: 0 bits
    w.write(0, 4); w.align()         // NG scaled lengths (placeholder)
    vals.foreach(v => w.write(v.toLong, 8))
    val s7 = section(7, b => { val d = w.bytes; b.out.write(d, 0, d.length) })
    (s5, s7)
  }

  private def message(s4: Array[Byte], vals: Seq[Int]): Array[Byte] = {
    val s1 = section(1, b => { b.u16(7).u16(0).u8(0).u8(0).u8(1)
      .u16(2026).u8(1).u8(1).u8(0).u8(0).u8(0).u8(0).u8(1) })
    val s6 = section(6, b => b.u8(255))
    val (s5, s7) = sections57(vals)
    val body = Array(s1, section3, s4, s5, s6, s7).flatten
    val msg = new Builder
    msg.u8('G').u8('R').u8('I').u8('B').u16(0).u8(0).u8(2)
    msg.u64(16L + body.length + 4)
    msg.out.write(body, 0, body.length)
    msg.u8('7').u8('7').u8('7').u8('7')
    msg.bytes
  }

  /** One file per lead time: 5 ensemble messages + 1 control, bz2'd —
    * the geprcp.tXXz.pgrb2a.0p50.bc_NNh shape. */
  private def writeFixture(dir: String, lead: Int): String = {
    val bytes = (Members.map { m =>
      message(section4Ens(m, lead), (0 until NPoints).map(fieldValue(m, lead, _)))
    } :+ message(section4Control(lead),
      (0 until NPoints).map(i => 42 + i % 3))).flatten.toArray
    val bz = new ByteArrayOutputStream()
    val z = new BZip2CompressorOutputStream(bz)
    z.write(bytes); z.close()
    val p = s"$dir/geprcp_shaped.bc_${lead}h.grib2.bz2"
    Files.write(Paths.get(p), bz.toByteArray)
    p
  }

  private lazy val fixtureDir: String = {
    val d = Files.createTempDirectory("gefs_shaped").toFile
    d.deleteOnExit()
    LeadHours.foreach(writeFixture(d.getAbsolutePath, _))
    d.getAbsolutePath
  }

  test("GEFS-shaped fixture decodes: 3.0 grid, 4.11 members, 4.8 control, 5.2 packing") {
    val msgs = Grib2.readFile(s"$fixtureDir/geprcp_shaped.bc_6h.grib2.bz2")
    assert(msgs.length === Members.size + 1)
    val ens = msgs.filter(_.productTemplate == 11)
    assert(ens.map(_.ensembleMember).sorted === Members.toSeq)
    assert(ens.forall(m => m.paramCategory == 1 && m.paramNumber == 8))
    assert(ens.forall(_.forecastTime == 6L))
    assert(ens.forall(_.gridTemplate == 0))
    val g = ens.head.grid.get
    assert(g.ni === Ni); assert(g.nj === Nj)
    assert(g.latLon(0) === ((15.0, 120.0)))
    assert(g.latLon(NPoints - 1) === ((14.0, 121.5)))
    // exact values through complex packing
    for (m <- ens; i <- 0 until NPoints)
      assert(m.values(i) === fieldValue(m.ensembleMember, 6, i).toDouble)
    val ctrl = msgs.filter(_.productTemplate == 8)
    assert(ctrl.size === 1 && ctrl.head.ensembleMember === -1)
    assert(ctrl.head.values.toSeq === (0 until NPoints).map(i => (42 + i % 3).toDouble))
  }

  test("seam e2e: readGrib2 -> ensembleMedian -> withCellId -> adminRainfall") {
    import spark.implicits._
    val df = ClimadaSources.readGrib2(spark, s"$fixtureDir/*.grib2.bz2")
    assert(df.count() === LeadHours.size.toLong * (Members.size + 1) * NPoints)

    // cube: ensemble rows only, time from the lead hour
    val cube = df.where(col("member") >= 1)
      .select(timestamp_seconds(col("forecast_time") * 3600).as("time"),
        col("lat"), col("lon"), col("value").as("precip"))
    val median = Rainfall.ensembleMedian(cube)

    // centroid→admin: north row+1 (points 0..5) = PH001, rest PH002 —
    // ids via the same public cellId formula the operator uses
    def cellId(lat: Double, lon: Double): Long =
      (math.floor((90.0 - lat) / 0.5) * 720 + math.floor((lon + 180.0) / 0.5)).toLong
    val admin = (0 until NPoints).map { i =>
      val (lat, lon) = (15.0 - (i / Ni) * 0.5, 120.0 + (i % Ni) * 0.5)
      (cellId(lat, lon), if (i < 6) "PH001" else "PH002")
    }.toDF("centroid_id", "admin_code")

    val got = Rainfall.adminRainfall(Rainfall.withCellId(median), admin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // independent expectation in plain Scala from the field formula
    def medianOf(xs: Seq[Int]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2).toDouble else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expected = Seq("PH001" -> (0 until 6), "PH002" -> (6 until NPoints))
      .map { case (code, pts) =>
        code -> LeadHours.map { lead =>
          pts.map(i => medianOf(Members.map(fieldValue(_, lead, i)))).sum / pts.size
        }.max
      }.toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (code, v) =>
      assert(math.abs(got(code) - v) < 1e-9, s"$code: got ${got(code)}, want $v")
    }
  }
}
