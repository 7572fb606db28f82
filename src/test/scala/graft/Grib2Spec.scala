package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.sources.{ClimadaSources, Grib2}

/** GRIB2 decoder against the reference's own climada test fixtures
  * (ICON-EU-EPS 10m wind gusts, template 3.101 + simple packing) plus
  * hand-built binary micro-fixtures for the complex-packing templates
  * 5.2/5.3 encoded directly from the WMO regulation text. Fixture
  * goldens were produced with an independent bit-level decoder. */
class Grib2Spec extends SparkTestBase {

  private val dataDir =
    "/root/reference/IBF-Typhoon-model/src/climada/hazard/test/data"
  private def fixture(n: String) =
    s"$dataDir/test_storm_europe_icon_2021012800_${n}_vmax_10m.grib2.bz2"
  private def have = new java.io.File(fixture("001")).isFile

  test("ICON fixture: 40 ensemble members of 49-point wind-gust fields") {
    assume(have)
    val msgs = Grib2.readFile(fixture("001"))
    assert(msgs.length === 40)
    assert(msgs.forall(m => m.discipline == 0 &&
      m.paramCategory == 2 && m.paramNumber == 22))   // momentum / gust
    assert(msgs.forall(_.productTemplate == 11))       // ensemble forecast
    assert(msgs.map(_.ensembleMember).distinct.sorted === (1 to 40))
    assert(msgs.forall(_.values.length == 49))
    assert(msgs.forall(_.gridTemplate == 101))
  }

  test("fixture values match the independent decoder to 1e-6") {
    assume(have)
    val m0 = Grib2.readFile(fixture("001")).head.values
    val exp0 = Seq(10.019612, 9.518636, 8.48055, 7.734456, 6.933675)
    m0.take(5).zip(exp0).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6) }
    assert(math.abs(m0.sum / m0.length - 8.852122) < 1e-6)

    val m1 = Grib2.readFile(fixture("001"))(1).values
    Seq(10.639937, 10.195601, 9.571577).zip(m1.take(3)).foreach {
      case (e, g) => assert(math.abs(g - e) < 1e-6) }

    val f2 = Grib2.readFile(fixture("002")).head.values
    Seq(9.315939, 8.626486, 7.132345, 7.295431, 5.810079).zip(f2.take(5))
      .foreach { case (e, g) => assert(math.abs(g - e) < 1e-6) }
  }

  // ---- hand-built message scaffolding --------------------------------

  private final class Builder {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Builder = { out.write(v & 0xFF); this }
    def u16(v: Int): Builder = { u8(v >> 8); u8(v) }
    def u32(v: Long): Builder = { u16((v >> 16).toInt); u16(v.toInt) }
    def u64(v: Long): Builder = { u32(v >> 32); u32(v) }
    def f32(v: Float): Builder = u32(java.lang.Float.floatToIntBits(v))
    def bytes: Array[Byte] = out.toByteArray
  }

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

  /** Assemble a single-field GRIB2 message around given section 5
    * template content and section 7 payload. */
  private def message(tmpl5: Int, nVals: Int, s5tmpl: Array[Byte],
                      s7data: Array[Byte]): Array[Byte] = {
    def section(num: Int, body: Builder => Unit): Array[Byte] = {
      val b = new Builder
      body(b)
      val content = b.bytes
      val h = new Builder
      h.u32(content.length + 5).u8(num)
      h.out.write(content, 0, content.length)
      h.bytes
    }
    val s1 = section(1, b => { b.u16(0).u16(0).u8(0).u8(0).u8(0)
      .u16(2021).u8(1).u8(28).u8(0).u8(0).u8(0).u8(0).u8(1) })
    val s3 = section(3, b => { b.u8(0).u32(nVals).u8(0).u8(0).u16(101) })
    val s4 = section(4, b => { b.u16(0).u16(0) // 0 coords, template 4.0
      .u8(2).u8(22).u8(2).u8(0).u8(0).u16(0).u8(0).u8(1).u32(0)
      .u8(103).u8(0).u32(10).u8(255).u8(0).u32(0) })
    val s5 = section(5, b => { b.u32(nVals).u16(tmpl5)
      b.out.write(s5tmpl, 0, s5tmpl.length) })
    val s6 = section(6, b => b.u8(255))
    val s7 = section(7, b => b.out.write(s7data, 0, s7data.length))
    val body = Array(s1, s3, s4, s5, s6, s7).flatten
    val msg = new Builder
    msg.u8('G').u8('R').u8('I').u8('B').u16(0).u8(0).u8(2)
    msg.u64(16L + body.length + 4)
    msg.out.write(body, 0, body.length)
    msg.u8('7').u8('7').u8('7').u8('7')
    msg.bytes
  }

  test("template 5.2 complex packing: three groups, NG scaled lengths") {
    // values [10,13,11, 5,0,7, 20,22]: refs 10/0/20, widths 2/3/2,
    // lengths 3/3/2. Data template 7.2 encodes NG (not NG-1) scaled
    // group lengths; with NG=3 at 4 bits the list spans 2 bytes after
    // alignment where an NG-1 reading spans 1 — so a decoder short one
    // entry starts the packed values a byte early and this fixture
    // fails loudly. The last scaled entry is a placeholder (9 → would
    // be length 3+9=12, overflowing n=8) that must be read, discarded,
    // and replaced by the true length from template-5.2 octets 43-46.
    val t = new Builder
    t.f32(0f).u16(0).u16(0).u8(5)   // R=0 E=0 D=0, 5 bits per group ref
      .u8(0)                         // original field type
      .u8(1)                         // group splitting method
      .u8(0)                         // missing value management
      .u32(0).u32(0)                 // missing substitutes
      .u32(3)                        // NG = 3
      .u8(2).u8(3)                   // group width reference 2, 3 bits/width
      .u32(3).u8(1)                  // group length reference 3, increment 1
      .u32(2)                        // true length of last group
      .u8(4)                         // bits per scaled group length
    val w = new BitWriter
    w.write(10, 5); w.write(0, 5); w.write(20, 5); w.align() // group refs
    w.write(0, 3); w.write(1, 3); w.write(0, 3); w.align()   // widths - 2
    w.write(0, 4); w.write(0, 4); w.write(9, 4); w.align()   // NG scaled lens
    w.write(0, 2); w.write(3, 2); w.write(1, 2)  // group 1 offsets (w=2)
    w.write(5, 3); w.write(0, 3); w.write(7, 3)  // group 2 offsets (w=3)
    w.write(0, 2); w.write(2, 2)                 // group 3 offsets (w=2)
    val msgs = Grib2.read(message(2, 8, t.bytes, w.bytes))
    assert(msgs.head.values.toSeq ===
      Seq(10.0, 13.0, 11.0, 5.0, 0.0, 7.0, 20.0, 22.0))
  }

  test("5.2 round-trip property: random group structures decode to the input") {
    // encode arbitrary (ref, width, offsets) group structures per the
    // WMO template text and assert exact decode — exercises width-0
    // groups, multi-group byte alignment, and the NG-placeholder rule
    // over shapes no hand-built fixture covers
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 30) {
      val ng = 1 + rnd.nextInt(6)
      val groups = (0 until ng).map { _ =>
        val len = 1 + rnd.nextInt(20)
        val ref = rnd.nextInt(200)
        val w = rnd.nextInt(5)
        val offsets = Seq.fill(len)(if (w == 0) 0 else rnd.nextInt(1 << w))
        (ref, w, offsets)
      }
      val vals = groups.flatMap { case (ref, _, offs) => offs.map(ref + _) }
      val t = new Builder
      t.f32(0f).u16(0).u16(0).u8(8)      // R=0 E=0 D=0, 8 bits per ref
        .u8(0).u8(1).u8(0)
        .u32(0).u32(0)
        .u32(ng)
        .u8(0).u8(3)                      // width ref 0, 3 bits per width
        .u32(0).u8(1)                     // length ref 0, increment 1
        .u32(groups.last._3.length)       // true last group length
        .u8(8)                            // 8 bits per scaled length
      val w = new BitWriter
      groups.foreach { case (ref, _, _) => w.write(ref.toLong, 8) }; w.align()
      groups.foreach { case (_, gw, _) => w.write(gw.toLong, 3) }; w.align()
      groups.init.foreach { case (_, _, offs) => w.write(offs.length.toLong, 8) }
      w.write(rnd.nextInt(256).toLong, 8); w.align()  // NG-th placeholder
      groups.foreach { case (_, gw, offs) =>
        if (gw > 0) offs.foreach(o => w.write(o.toLong, gw)) }
      val msgs = Grib2.read(message(2, vals.length, t.bytes, w.bytes))
      assert(msgs.head.values.toSeq === vals.map(_.toDouble))
    }
  }

  test("5.3 round-trip property: random fields survive 2nd-order differencing") {
    // encode per WMO 7.3: stored[i] = (2nd difference - gmin) for
    // i >= 2, zeros for the two seed positions (overwritten by the
    // preamble's initial values on decode); random multi-group split
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 30) {
      val n = 3 + rnd.nextInt(38)
      val field = Array.fill(n)(rnd.nextInt(200))
      val d = Array.tabulate(n)(i =>
        if (i < 2) 0L else field(i) - 2L * field(i - 1) + field(i - 2))
      val gmin = d.drop(2).min
      val stored = Array.tabulate(n)(i => if (i < 2) 0L else d(i) - gmin)
      // random contiguous group split
      val cuts = (Seq(0, n) ++ Seq.fill(rnd.nextInt(3))(1 + rnd.nextInt(n - 1)))
        .distinct.sorted
      val groups = cuts.zip(cuts.tail).map { case (a, b) => stored.slice(a, b) }
      def bitsFor(v: Long): Int = if (v <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)
      val t = new Builder
      t.f32(0f).u16(0).u16(0).u8(16)     // R=0 E=0 D=0, 16 bits per ref
        .u8(0).u8(1).u8(0)
        .u32(0).u32(0)
        .u32(groups.length)
        .u8(0).u8(6)                      // width ref 0, 6 bits per width
        .u32(0).u8(1)                     // length ref 0, increment 1
        .u32(groups.last.length)          // true last group length
        .u8(8)                            // 8 bits per scaled length
        .u8(2).u8(2)                      // sd order 2, 2 octets per field
      val w = new BitWriter
      w.write(field(0).toLong & 0xFFFF, 16)          // iv1 (sign-magnitude)
      w.write(field(1).toLong & 0xFFFF, 16)          // iv2
      val gm = if (gmin < 0) 0x8000L | -gmin else gmin
      w.write(gm, 16)                                 // gmin sign-magnitude
      val refs = groups.map(g => g.min)
      val widths = groups.map(g => bitsFor(g.max - g.min))
      refs.foreach(r => w.write(r, 16)); w.align()
      widths.foreach(gw => w.write(gw.toLong, 6)); w.align()
      groups.init.foreach(g => w.write(g.length.toLong, 8))
      w.write(rnd.nextInt(256).toLong, 8); w.align() // NG-th placeholder
      groups.zip(widths).foreach { case (g, gw) =>
        if (gw > 0) g.foreach(v => w.write(v - g.min, gw)) }
      val msgs = Grib2.read(message(3, n, t.bytes, w.bytes))
      assert(msgs.head.values.toSeq === field.map(_.toDouble).toSeq,
        s"n=$n groups=${groups.map(_.length).mkString(",")}")
    }
  }

  test("template 5.3 spatial differencing order 2 reconstructs the field") {
    // true field [5,7,10,14,19,25]; 2nd differences all 1, gmin 1
    val t = new Builder
    t.f32(0f).u16(0).u16(0).u8(0)   // R=0 E=0 D=0, 0 bits per group ref
      .u8(0).u8(1).u8(0)
      .u32(0).u32(0)
      .u32(1)                        // NG = 1
      .u8(0).u8(0)                   // width ref 0, 0 bits/width
      .u32(6).u8(1)                  // length ref 6 (unused: single group)
      .u32(6)                        // last group true length 6
      .u8(0)                         // 0 bits per group length
      .u8(2).u8(2)                   // sd order 2, 2 octets per sd field
    val w = new BitWriter
    w.write(5, 16)                   // ival1 (sign-magnitude 16-bit)
    w.write(7, 16)                   // ival2
    w.write(1, 16)                   // gmin
    // group blocks: 0-bit refs/widths/lengths, 0-bit data — all empty
    val msgs = Grib2.read(message(3, 6, t.bytes, w.bytes))
    assert(msgs.head.values.toSeq === Seq(5.0, 7.0, 10.0, 14.0, 19.0, 25.0))
  }

  test("GEFS pgrb2a shape: template 4.11 ensemble accumulation on a 0.5-deg 3.0 grid, 5.3 packing") {
    // The reference ingests NOMADS `geprcp.t*.pgrb2a.0p50.bc_{06,24}h`
    // (Rainfall_data.py:40-65): discipline 0 (meteorological), APCP
    // (category 1, number 8), product template 4.11 (individual
    // ensemble member over a time interval), grid template 3.0 regular
    // 0.5-degree lat/lon, complex packing with 2nd-order spatial
    // differencing (5.3). This fixture reproduces that exact message
    // shape on a 5x3 sub-grid.
    def section(num: Int, body: Builder => Unit): Array[Byte] = {
      val b = new Builder
      body(b)
      val content = b.bytes
      val h = new Builder
      h.u32(content.length + 5).u8(num)
      h.out.write(content, 0, content.length)
      h.bytes
    }
    val ni = 5; val nj = 3; val n = ni * nj
    // 6-hour precip accumulation field (tenths of mm as integers)
    val field = Array(0, 2, 5, 9, 14, 1, 4, 8, 13, 19, 3, 7, 12, 18, 25)
    val d = Array.tabulate(n)(i =>
      if (i < 2) 0L else field(i) - 2L * field(i - 1) + field(i - 2))
    val gmin = d.drop(2).min
    val stored = Array.tabulate(n)(i => if (i < 2) 0L else d(i) - gmin)
    val groups = Seq(stored.slice(0, 8), stored.slice(8, n))
    def bitsFor(v: Long): Int =
      if (v <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)

    val s1 = section(1, b => { b.u16(7).u16(2).u8(2).u8(1).u8(1)
      .u16(2024).u8(11).u8(14).u8(0).u8(0).u8(0).u8(0).u8(1) })
    val s3 = section(3, b => { b.u8(0).u32(n).u8(0).u8(0).u16(0) // template 3.0
      .u8(6).u8(0).u32(0).u8(0).u32(0).u8(0).u32(0)  // earth shape octets 15-30
      .u32(ni).u32(nj)                                // Ni, Nj
      .u32(0).u32(0)                                  // basic angle, subdivisions
      .u32(15000000L).u32(120000000L)                 // lat1 15.0, lon1 120.0
      .u8(48)                                         // res & component flags
      .u32(14000000L).u32(122000000L)                 // lat2 14.0, lon2 122.0
      .u32(500000L).u32(500000L)                      // Di = Dj = 0.5 deg
      .u8(0) })                                       // scan +i, -j
    val s4 = section(4, b => { b.u16(0).u16(11)       // template 4.11
      .u8(1).u8(8)                                    // APCP: category 1, number 8
      .u8(4).u8(0).u8(0).u16(0).u8(0)                 // ens generating process
      .u8(1).u32(0)                                   // time unit hour, fcTime 0
      .u8(1).u8(0).u32(0).u8(255).u8(0).u32(0)        // ground surface
      .u8(3).u8(17).u8(30)                            // perturbed member 17 of 30
      .u16(2024).u8(11).u8(14).u8(6).u8(0).u8(0)      // end of interval
      .u8(1).u32(0)                                   // 1 time range, 0 missing
      .u8(1).u8(2).u8(1).u32(6).u8(255).u32(0) })     // accumulation over 6 h
    val s5 = section(5, b => { b.u32(n).u16(3)        // template 5.3
      b.f32(0f).u16(0).u16(1)                         // R=0 E=0 D=1 (tenths of mm)
      b.u8(16).u8(0).u8(1).u8(0)
        .u32(0).u32(0)
        .u32(groups.length)
        .u8(0).u8(6)
        .u32(0).u8(1)
        .u32(groups.last.length)
        .u8(8)
        .u8(2).u8(2) })
    val s6 = section(6, b => b.u8(255))
    val w = new BitWriter
    w.write(field(0).toLong & 0xFFFF, 16)
    w.write(field(1).toLong & 0xFFFF, 16)
    w.write(if (gmin < 0) 0x8000L | -gmin else gmin, 16)
    val refs = groups.map(_.min)
    val widths = groups.map(g => bitsFor(g.max - g.min))
    refs.foreach(r => w.write(r, 16)); w.align()
    widths.foreach(gw => w.write(gw.toLong, 6)); w.align()
    groups.init.foreach(g => w.write(g.length.toLong, 8))
    w.write(99, 8); w.align()                         // NG-th placeholder
    groups.zip(widths).foreach { case (g, gw) =>
      if (gw > 0) g.foreach(v => w.write(v - g.min, gw)) }
    val s7 = section(7, b => { val x = w.bytes; b.out.write(x, 0, x.length) })

    val body = Array(s1, s3, s4, s5, s6, s7).flatten
    val msg = new Builder
    msg.u8('G').u8('R').u8('I').u8('B').u16(0).u8(0).u8(2)
    msg.u64(16L + body.length + 4)
    msg.out.write(body, 0, body.length)
    msg.u8('7').u8('7').u8('7').u8('7')

    val fields = Grib2.read(msg.bytes)
    assert(fields.length === 1)
    val f = fields.head
    assert(f.discipline === 0 && f.paramCategory === 1 && f.paramNumber === 8)
    assert(f.productTemplate === 11)
    assert(f.ensembleMember === 17)
    assert(f.timeUnit === 1 && f.forecastTime === 0L)
    val g = f.grid.get
    assert(g.ni === 5 && g.nj === 3)
    assert(g.lat1 === 15.0 && g.lon1 === 120.0)
    assert(g.lat2 === 14.0 && g.lon2 === 122.0)
    assert(g.di === 0.5 && g.dj === 0.5 && g.scanMode === 0)
    // D=1 divides the packed integers by 10 (tenths of mm -> mm)
    assert(f.values.toSeq === field.map(_ / 10.0).toSeq)
  }

  test("repeated sections 4-7 decode one field each; forecast time is signed") {
    // One GRIB2 message carrying TWO fields (sections 4,5,6,7 repeat
    // after the shared section 3) — the spec allows 2-7 to repeat, one
    // field per section-7 occurrence. Field 2's forecast time is -6
    // (two's complement), as analysis products encode negative leads.
    def section(num: Int, body: Builder => Unit): Array[Byte] = {
      val b = new Builder
      body(b)
      val content = b.bytes
      val h = new Builder
      h.u32(content.length + 5).u8(num)
      h.out.write(content, 0, content.length)
      h.bytes
    }
    def s4(fcTime: Long) = section(4, b => { b.u16(0).u16(0)
      .u8(2).u8(22).u8(2).u8(0).u8(0).u16(0).u8(0).u8(1).u32(fcTime)
      .u8(103).u8(0).u32(10).u8(255).u8(0).u32(0) })
    // simple packing, 3 values, 4 bits each
    def s5 = section(5, b => { b.u32(3).u16(0)
      b.f32(0f).u16(0).u16(0).u8(4).u8(0) })
    def s7(vals: Seq[Int]) = section(7, b => {
      val w = new BitWriter
      vals.foreach(v => w.write(v, 4))
      val d = w.bytes; b.out.write(d, 0, d.length) })
    val s1 = section(1, b => { b.u16(0).u16(0).u8(0).u8(0).u8(0)
      .u16(2021).u8(1).u8(28).u8(0).u8(0).u8(0).u8(0).u8(1) })
    val s3 = section(3, b => { b.u8(0).u32(3).u8(0).u8(0).u16(101) })
    val s6 = section(6, b => b.u8(255))
    val body = Array(s1, s3,
      s4(6), s5, s6, s7(Seq(1, 2, 3)),
      s4(-6L & 0xFFFFFFFFL), s5, s6, s7(Seq(4, 5, 6))).flatten
    val msg = new Builder
    msg.u8('G').u8('R').u8('I').u8('B').u16(0).u8(0).u8(2)
    msg.u64(16L + body.length + 4)
    msg.out.write(body, 0, body.length)
    msg.u8('7').u8('7').u8('7').u8('7')
    val fields = Grib2.read(msg.bytes)
    assert(fields.length === 2)
    assert(fields(0).values.toSeq === Seq(1.0, 2.0, 3.0))
    assert(fields(1).values.toSeq === Seq(4.0, 5.0, 6.0))
    assert(fields(0).forecastTime === 6L)
    assert(fields(1).forecastTime === -6L)
  }

  test("readGrib2 DataFrame adapter + ensemble median over both files") {
    assume(have)
    val df = ClimadaSources.readGrib2(spark,
      s"$dataDir/test_storm_europe_icon_2021012800_00{1,2}_vmax_10m.grib2.bz2")
    assert(df.count() === 2L * 40 * 49)
    // per-point ensemble median across the 40 members of file 001,
    // cube shaped like Rainfall.ensembleMedian expects
    val cube = df.where(col("path").contains("_001_"))
      .select(lit(0).as("time"), col("point_idx").as("lat"),
        lit(0.0).as("lon"), col("value").as("precip"))
    val med = graft.rain.Rainfall.ensembleMedian(cube)
    assert(med.count() === 49)
    // independent check for point 0: exact interpolated median in Scala
    val p0 = df.where(col("path").contains("_001_") && col("point_idx") === 0)
      .select("value").collect().map(_.getDouble(0)).sorted
    val exp = (p0(19) + p0(20)) / 2.0
    val got = med.where(col("lat") === 0).select("precip").head().getDouble(0)
    assert(math.abs(got - exp) < 1e-12)
  }
}
