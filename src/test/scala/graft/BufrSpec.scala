package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bufr, ClimadaSources}

/** The from-scratch binary BUFR decoder against the reference's real
  * ECMWF fixture files (tracks_22S_HEROLD_2020031912.{det,eps}.bufr4
  * — one uncompressed single-subset message and one compressed
  * 52-subset message of the same forecast cycle).
  *
  * Validation strategy: (a) metadata facts independently recorded in
  * the file NAME (storm 22S HEROLD, cycle 2020-03-19 12z) and the
  * format (ECMWF centre 98, 52 members); (b) the two vendored-test
  * golden values whose derivation the adapter mirrors (det
  * central_pressure[0] == 1000.0 mb, det lon[1] == 73.5); (c) CROSS-
  * COMPRESSION agreement — the det run appears in both files (member
  * 52), so the uncompressed and compressed decode paths must produce
  * the same position series from independently encoded payloads.
  */
class BufrSpec extends AnyFunSuite {

  private val dataDir = "/root/reference/IBF-Typhoon-model/src/climada/hazard/test/data"
  private lazy val det = Bufr.decode(s"$dataDir/tracks_22S_HEROLD_2020031912.det.bufr4")
  private lazy val eps = Bufr.decode(s"$dataDir/tracks_22S_HEROLD_2020031912.eps.bufr4")

  private def series(s: Seq[Bufr.Value], desc: Int, wantSig: Int = -1): Seq[Option[Double]] = {
    var sig = -1
    s.flatMap { v =>
      v.descriptor match {
        case 8005 => sig = v.num.map(_.toInt).getOrElse(-1); None
        case `desc` if wantSig < 0 || sig == wantSig => Some(v.num)
        case _ => None
      }
    }
  }

  test("section metadata: ECMWF centre, subset counts, compression, cycle time") {
    assert(det.centre == 98 && eps.centre == 98)
    assert(det.nSubsets == 1 && !det.compressed)
    assert(eps.nSubsets == 52 && eps.compressed)
    for (m <- Seq(det, eps))
      assert((m.year, m.month, m.day, m.hour, m.minute) == (2020, 3, 19, 12, 0))
  }

  test("storm identity and ensemble numbering") {
    val s0 = det.subsets.head
    assert(s0.find(_.descriptor == 1025).flatMap(_.str).contains("22S"))
    assert(s0.find(_.descriptor == 1027).flatMap(_.str).map(_.trim).contains("HEROLD"))
    val members = eps.subsets.flatMap(_.find(_.descriptor == 1091).flatMap(_.num))
    assert(members == (1 to 52).map(_.toDouble))
  }

  test("vendored-test goldens: det pressure 1000.0 mb, det lon[1] 73.5") {
    val s0 = det.subsets.head
    val pcen = s0.filter(_.descriptor == 10051).flatMap(_.num)
    assert(pcen(1) / 100.0 == 1000.0) // central_pressure[0] after analysis drop
    val lonc = series(s0, 6002, wantSig = 1).flatten
    assert(lonc(2) == 73.5) // lon[1] after analysis drop
  }

  test("cross-compression: det track equals eps member 52 positions") {
    val s52 = eps.subsets.find(
      _.find(_.descriptor == 1091).flatMap(_.num).contains(52.0)).get
    val detLat = series(det.subsets.head, 5002, wantSig = 1).flatten
    val epsLat = series(s52, 5002, wantSig = 1).flatten
    assert(detLat == epsLat && detLat.nonEmpty)
    val detLon = series(det.subsets.head, 6002, wantSig = 1).flatten
    val epsLon = series(s52, 6002, wantSig = 1).flatten
    assert(detLon == epsLon)
  }

  test("template structure: radii thresholds and quadrant bearings") {
    val s0 = det.subsets.head
    assert(s0.filter(_.descriptor == 19003).flatMap(_.num).distinct == Seq(18.0, 26.0, 33.0))
    val bearings = s0.filter(_.descriptor == 5021).flatMap(_.num).distinct.sorted
    assert(bearings == Seq(0.0, 90.0, 180.0, 270.0))
  }

  test("readEcmwfBufr: tracks DataFrame with dead steps dropped") {
    val spark = Engine.local(4)
    val det2 = ClimadaSources.readEcmwfBufr(spark, s"$dataDir/tracks_22S_HEROLD_2020031912.det.bufr4")
    val rows = det2.orderBy("time_offset_h").collect()
    assert(rows.length == 2) // det: 2 forecast steps, analysis dropped
    assert(rows.forall(!_.getAs[Boolean]("is_ensemble"))) // type 0 = deterministic
    assert(rows.head.getAs[Double]("central_pressure") == 1000.0)
    assert(rows.head.getAs[java.sql.Timestamp]("time").toString.startsWith("2020-03-19 18:00"))
    val eps2 = ClimadaSources.readEcmwfBufr(spark, s"$dataDir/tracks_22S_HEROLD_2020031912.eps.bufr4")
    // two members have no live forecast step at all — they vanish, like
    // the reference's `if track.sizes['time'] == 0: continue`
    assert(eps2.select("ens_id").distinct().count() == 50)
    // member 52 carries forecast type 0 (the control) → not ensemble;
    // all other members are perturbed ensemble runs
    val byEns = eps2.groupBy("is_ensemble").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(!eps2.where(org.apache.spark.sql.functions.col("ens_id") === 52)
      .collect().exists(_.getAs[Boolean]("is_ensemble")))
    assert(byEns(true) == eps2.count() - byEns(false))
    // member 1 dies after 12h: analysis + 2 live steps → 2 rows
    assert(eps2.where(org.apache.spark.sql.functions.col("ens_id") === 1).count() == 2)
    // max_radius from centre↔max-wind-location flat-earth distance:
    // det step 1: centre (-26.7, 72.8), max wind at (-26.6, 73.6)
    val mr = rows.head.getAs[Double]("max_radius_km")
    assert(math.abs(mr - math.sqrt(0.1 * 0.1 + 0.8 * 0.8) * 111.0) < 1e-9)
    // per-quadrant wind radii surfaced from the 019003/005021/019004
    // template walk: HEROLD's det message encodes 0 m for every
    // quadrant at all three thresholds (present, not missing)
    val radiiCols = for {
      kt <- Seq("34", "50", "64"); q <- Seq("ne", "se", "sw", "nw")
    } yield s"radius_${kt}kt_${q}_km"
    radiiCols.foreach { c =>
      assert(rows.forall(_.getAs[Double](c) == 0.0), s"$c should be 0.0")
    }
    assert(det2.columns.count(_.startsWith("radius_")) == 13) // 12 + rmw
  }
}
