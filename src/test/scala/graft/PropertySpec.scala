package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{GeoFunctions, ScalarFunctions}
import graft.hazard.Windfield

/** Property tests (SURVEY.md §5.2 item 2): F14 monotonicity and knot
  * values, F1 haversine symmetry/triangle, F5 bin edges, X3 clip
  * bounds — checked over generated inputs, evaluated through the real
  * column expressions in batches (one Spark job per property, not per
  * case). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def evalBatch(inputs: Seq[Seq[Double]],
                        f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Seq[Double] = {
    val n = inputs.head.length
    val df = inputs.map {
      case Seq(a) => (a, 0.0, 0.0, 0.0)
      case Seq(a, b) => (a, b, 0.0, 0.0)
      case Seq(a, b, c) => (a, b, c, 0.0)
      case Seq(a, b, c, d) => (a, b, c, d)
    }.toDF("a", "b", "c", "d")
    df.select(f(Seq(col("a"), col("b"), col("c"), col("d")).take(n)).as("v"))
      .collect().map(_.getDouble(0)).toSeq
  }

  test("F14 rmw estimate is monotone nondecreasing in pressure over the knot range") {
    val ps = (0 until 300).map(i => 872.0 + i * 0.5)
    val got = evalBatch(ps.map(Seq(_)),
      { case Seq(p) => ScalarFunctions.estimateRmwNm(p) })
    got.sliding(2).foreach { case Seq(a, b) => assert(b >= a - 1e-12) }
  }

  test("F1 haversine: symmetry, non-negativity, triangle inequality on random triples") {
    val gen = for {
      lat <- Gen.choose(-80.0, 80.0); lon <- Gen.choose(-179.0, 179.0)
    } yield (lat, lon)
    val pts = Gen.listOfN(60, gen).sample.get
    val triples = pts.grouped(3).collect { case List(p, q, r) => (p, q, r) }.toSeq
    val rows = triples.map { case ((la1, lo1), (la2, lo2), (la3, lo3)) =>
      (la1, lo1, la2, lo2, la3, lo3) }
      .toDF("la1", "lo1", "la2", "lo2", "la3", "lo3")
    val got = rows.select(
      GeoFunctions.haversineKm($"la1", $"lo1", $"la2", $"lo2").as("pq"),
      GeoFunctions.haversineKm($"la2", $"lo2", $"la1", $"lo1").as("qp"),
      GeoFunctions.haversineKm($"la2", $"lo2", $"la3", $"lo3").as("qr"),
      GeoFunctions.haversineKm($"la1", $"lo1", $"la3", $"lo3").as("pr"))
      .collect()
    got.foreach { r =>
      val (pq, qp, qr, pr) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(pq == qp)                      // symmetric
      assert(pq >= 0.0)
      assert(pr <= pq + qr + 1e-6)          // triangle
    }
  }

  test("F5 pagasa bins are exhaustive and ordered for any wind speed") {
    val speeds = Gen.listOfN(200, Gen.choose(0.0, 400.0)).sample.get
    val got = speeds.toDF("kph")
      .select($"kph", ScalarFunctions.pagasaCategory($"kph").as("cat")).collect()
    val order = Seq("TD", "TS", "STS", "TY", "STY")
    got.foreach(r => assert(order.contains(r.getString(1))))
    // monotone: higher speed never maps to a lower category
    val sorted = got.sortBy(_.getDouble(0)).map(r => order.indexOf(r.getString(1)))
    sorted.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
  }

  test("X3 hol_b always lands in [1, 2.5] for arbitrary physical inputs") {
    val gen = for {
      v <- Gen.choose(0.0, 40.0); penv <- Gen.choose(990.0, 1020.0)
      pcen <- Gen.choose(850.0, 1020.0); prev <- Gen.choose(850.0, 1020.0)
      lat <- Gen.choose(-60.0, 60.0)
    } yield (v, penv, pcen, prev, lat)
    val rows = Gen.listOfN(300, gen).sample.get
      .toDF("v", "penv", "pcen", "prev", "lat")
    val got = rows.select(Windfield.holB($"v", $"penv", $"pcen", $"prev",
      $"lat", lit(1.0)).as("b")).collect().map(_.getDouble(0))
    got.foreach(b => assert(b >= 1.0 && b <= 2.5))
  }

  test("W3 interpolation endpoints are exact observations") {
    import java.sql.Timestamp
    import graft.tracks.TrackPrep
    val vals = Gen.listOfN(10, Gen.choose(-100.0, 100.0)).sample.get
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("S", 1, Timestamp.valueOf(f"2024-01-01 ${i * 2}%02d:00:00"),
        if (i % 2 == 0) Some(v) else None)
    }.toDF("storm_id", "ens_id", "time", "v")
    val got = TrackPrep.interpolateLinear(rows, Seq("v"))
      .orderBy("time").collect()
    vals.zipWithIndex.filter(_._2 % 2 == 0).foreach { case (v, i) =>
      assert(got(i).getDouble(3) == v)   // observed points unchanged
    }
  }

  test("X4 holland wind is non-negative and peaks near rmax") {
    val dists = (1 to 400).map(_ * 2.0)
    val got = evalBatch(dists.map(Seq(_)),
      { case Seq(dc) => Windfield.statHolland(dc, lit(40.0), lit(1.5),
        lit(1010.0), lit(950.0), lit(14.0)) })
    assert(got.forall(_ >= 0.0))
    val peakDist = dists(got.indexOf(got.max))
    assert(peakDist >= 20.0 && peakDist <= 80.0)   // near rmax = 40 km
  }

  test("gopher signals lie in [0,1] and dedup drops only duplicated mass") {
    import graft.operators.TextOps
    val wordGen = Gen.listOfN(30,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "", " ", "x\ny"))
    val docs = (0L until 40L).map { i =>
      (i, wordGen.sample.getOrElse(Nil).mkString(" "))
    }.toDF("doc_id", "text")
    val sig = TextOps.gopherRepetitionSignals(docs).collect()
    sig.foreach { r =>
      Seq(1, 2, 3).foreach { c =>
        val v = r.getDouble(c)
        assert(v >= 0.0 && v <= 1.0, s"col $c out of range: $v")
      }
    }
    // conservation under line dedup on the same generated corpus
    val out = TextOps.lineDedup(docs).collect()
    out.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0)
    }
  }

  test("deterministicMixture is a filter: subset, per-source monotone in fraction") {
    import graft.operators.Sampling
    val docs = (0L until 400L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    def kept(f: Double): Set[Long] =
      Sampling.deterministicMixture(docs, Map("src0" -> f, "src1" -> f),
          defaultFraction = f / 2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    var prev = Set.empty[Long]
    Seq(0.0, 0.2, 0.5, 0.8, 1.0).foreach { f =>
      val k = kept(f)
      assert(k.subsetOf(all))
      assert(prev.subsetOf(k), s"fraction $f lost rows kept at a lower fraction")
      prev = k
    }
    assert(kept(0.0).isEmpty)
  }

  test("lmScore is maximal for text the reference corpus saw verbatim") {
    import graft.operators.TextOps
    val ref = Seq((0L, "one two three four five")).toDF("doc_id", "text")
    val (c, b, v) = TextOps.bigramCounts(ref)
    val score = Seq((1L, "one two three four five"),
      (2L, "five four three two one"))
      .toDF("doc_id", "text")
    val got = TextOps.lmScore(score, c, b, v).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L), s"verbatim ${got(1L)} vs reversed ${got(2L)}")
  }
}
