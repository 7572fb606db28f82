package graft

import org.apache.spark.sql.functions._

import graft.impact.XgbBooster
import graft.operators.XgbProbe

/** The reference's operational XGBoost damage models, loaded from
  * their own RDS artifacts (models/operational/, scored by
  * run_model_V2.R:160-165) via the from-scratch R-serialization
  * reader. Structure goldens below were cross-read from the files
  * with an independent parser. */
class XgbSpec extends SparkTestBase {

  private val dir = "/root/reference/IBF-Typhoon-model/models/operational"
  private def have = new java.io.File(dir).isDirectory

  private val expectedNames = Seq("GEN_landslide", "GEN_landslide_y",
    "GEN_landslide_o", "GEN_landslide_r", "GEN_stormsurge")
  private val expectedTail = Seq("INT_windspeed_coast_yn",
    "INT_windspeed_cube_coast_yn", "INT_coast_yn_elevation")

  test("v4 booster parses: 300 trees, 4810 nodes, 62 named features") {
    assume(have)
    val b = XgbBooster.load(s"$dir/xgboost_regression_v4.RDS")
    assert(b.trees.length === 300)
    assert(b.numNodes === 4810)
    assert(b.baseScore === 0.5f)
    assert(b.numFeature === 62)
    assert(b.featureNames.length === 62)
    assert(b.featureNames.take(5) === expectedNames)
    assert(b.featureNames.takeRight(3) === expectedTail)
  }

  test("v2 booster parses: 50 trees, 5570 nodes, same feature schema") {
    assume(have)
    val b = XgbBooster.load(s"$dir/xgboost_regression_v2.RDS")
    assert(b.trees.length === 50)
    assert(b.numNodes === 5570)
    assert(b.featureNames === XgbBooster.load(s"$dir/xgboost_regression_v4.RDS").featureNames)
  }

  test("prediction is deterministic and path-sensitive") {
    assume(have)
    val b = XgbBooster.load(s"$dir/xgboost_regression_v4.RDS")
    val zeros = b.predict(Array.fill(62)(0.0))
    assert(zeros === b.predict(Array.fill(62)(0.0)))
    val big = b.predict(Array.fill(62)(1e6))
    assert(zeros !== big)
  }

  test("NaN features follow default_left at every visited node") {
    assume(have)
    val b = XgbBooster.load(s"$dir/xgboost_regression_v4.RDS")
    // manual default-direction traversal, independent of predict()
    var expected: Double = b.baseScore.toDouble
    b.trees.foreach { tr =>
      var n = 0
      while (tr.left(n) != -1)
        n = if (tr.defaultLeft(n)) tr.left(n) else tr.right(n)
      expected += tr.cond(n).toDouble
    }
    assert(b.predict(Array.fill(62)(Double.NaN)) === expected)
  }

  test("xgb_score expression matches driver-side predict") {
    assume(have)
    import spark.implicits._
    GraftExtensions.register(spark)
    val b = XgbBooster.load(s"$dir/xgboost_regression_v4.RDS")
    val rows = Seq(
      (1L, Array.tabulate(62)(j => j * 10.0 - 300.0)),
      (2L, Array.fill(62)(0.0)),
      (3L, Array.tabulate(62)(j => math.sin(j.toDouble) * 500.0)))
    val df = rows.toDF("id", "f")
      .select(col("id"), call_function("xgb_score", col("f"),
        lit(s"$dir/xgboost_regression_v4.RDS")).as("p"))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, f) => assert(got(id) === b.predict(f)) }
  }

  test("JSON save/load round-trips the operational model bit-exactly") {
    assume(have)
    val b = XgbBooster.load(s"$dir/xgboost_regression_v4.RDS")
    val tmp = java.nio.file.Files.createTempFile("xgb-model", ".json").toString
    try {
      XgbBooster.save(b, tmp)
      val back = XgbBooster.load(tmp)
      assert(back.baseScore === b.baseScore)
      assert(back.numFeature === b.numFeature)
      assert(back.featureNames === b.featureNames)
      assert(back.trees.length === b.trees.length)
      back.trees.zip(b.trees).foreach { case (x, y) =>
        assert(x.feat.toSeq === y.feat.toSeq)
        assert(x.cond.toSeq === y.cond.toSeq) // float32 exact
        assert(x.left.toSeq === y.left.toSeq)
        assert(x.right.toSeq === y.right.toSeq)
        assert(x.defaultLeft.toSeq === y.defaultLeft.toSeq)
      }
      val f = b.medianSplitByFeature
      assert(back.predict(f) === b.predict(f))
    } finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
  }

  test("trained GbtTrainer model persists and scores via xgb_score(path)") {
    import spark.implicits._
    val rows = (0 until 200).map(i => (i.toDouble % 13, (i * 7 % 11).toDouble,
      (i % 13) * 2.0 - (i * 7 % 11) * 0.5))
    val df = rows.toDF("f0", "f1", "y")
    val booster = graft.impact.GbtTrainer.train(df, "y", Seq("f0", "f1"),
      graft.impact.GbtParams(numRound = 4, maxDepth = 3, eta = 0.3,
        gamma = 0.1, subsample = 1.0))
    val tmp = java.nio.file.Files.createTempFile("gbt-trained", ".json").toString
    try {
      XgbBooster.save(booster, tmp)
      graft.GraftExtensions.register(spark)
      val scored = df.withColumn("p",
        call_function("xgb_score", array($"f0", $"f1"), lit(tmp)))
        .select("f0", "f1", "p").collect()
      scored.foreach { r =>
        assert(r.getDouble(2) ===
          booster.predict(Array(r.getDouble(0), r.getDouble(1))))
      }
    } finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
  }

  test("logistic save records the objective and a probability-scale base_score") {
    import spark.implicits._
    val rows = (0 until 200).map(i => (i.toDouble % 13, (i * 7 % 11).toDouble,
      if (i % 13 > 6) 1.0 else 0.0))
    val df = rows.toDF("f0", "f1", "y")
    val booster = graft.impact.GbtTrainer.train(df, "y", Seq("f0", "f1"),
      graft.impact.GbtParams(numRound = 4, maxDepth = 3, eta = 0.3,
        gamma = 0.0, subsample = 1.0, baseScore = 0.3f,
        objective = "binary:logistic"))
    val tmp = java.nio.file.Files.createTempFile("gbt-logistic", ".json").toString
    try {
      XgbBooster.save(booster, tmp)
      val json = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(tmp)), java.nio.charset.StandardCharsets.UTF_8)
      assert(json.contains("\"binary:logistic\""))
      // on disk: probability scale (xgboost's convention), not the margin
      val stored = org.json4s.jackson.JsonMethods.parse(json) \ "learner" \
        "learner_model_param" \ "base_score" match {
        case org.json4s.JString(s) => s.toDouble
        case other => fail(s"unexpected base_score: $other")
      }
      assert(stored > 0.0 && stored < 1.0)
      assert(math.abs(stored - 0.3) < 1e-6)
      // in memory: the margin round-trips bit-exactly through ProbToMargin
      val back = XgbBooster.load(tmp)
      assert(back.objective === "binary:logistic")
      assert(back.baseScore === booster.baseScore)
      val f = booster.medianSplitByFeature
      assert(back.predict(f) === booster.predict(f))
    } finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
  }

  test("probe registers only when the reference artifact exists") {
    if (have) assert(XgbProbe.probes.map(_.name) === Seq("x24_xgb_reference_model"))
    else assert(XgbProbe.probes.isEmpty)
  }
}
