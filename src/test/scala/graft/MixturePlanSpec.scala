package graft

import org.apache.spark.sql.functions._

import graft.operators.{MixturePlan, Rollup, Sampling, StratifiedSample}

/** Temperature-mixture planning off the at-rest artifacts (x138):
  * quota parity with the one-shot temperatureMixture, the loud
  * quota-exceeds-k refusal, selection law (per-stratum smallest
  * stsample keys), and the no-corpus-in-the-plan gate. */
class MixturePlanSpec extends SparkTestBase {

  import spark.implicits._

  // skewed strata: lang0 4×, lang1 2×, lang2 1× — temperature
  // rebalancing has something to rebalance
  private def docs(n: Int) =
    (0 until n).map { i =>
      val lang = if (i % 7 < 4) "lang0" else if (i % 7 < 6) "lang1"
                 else "lang2"
      (i.toLong, lang, (i % 101).toLong)
    }.toDF("doc_id", "lang", "len")

  private def artifacts(all: org.apache.spark.sql.DataFrame, k: Int) = {
    val ro = java.nio.file.Files.createTempDirectory("mx_ro").toString
    val st = java.nio.file.Files.createTempDirectory("mx_st").toString
    Rollup.writeRollup(all.where($"doc_id" % 2 === 0), ro, Seq("lang"), "len")
    Rollup.appendToRollup(all.where($"doc_id" % 2 === 1), ro, Some("b1"))
    StratifiedSample.writeSample(all.where($"doc_id" % 2 === 0), st, k,
      strataCol = "lang")
    StratifiedSample.appendToSample(all.where($"doc_id" % 2 === 1), st,
      Some("b1"))
    (ro, st)
  }

  test("quotas off the persisted rollup equal temperatureMixture's " +
      "quota math on the corpus") {
    val all = docs(700)
    val (ro, _) = artifacts(all, k = 10)
    val got = MixturePlan.quotasFromRollup(spark, ro, targetTotal = 90)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // re-derive with the same round-6-then-floor rule
    val counts = all.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tw = counts.values.map(n => math.sqrt(n.toDouble)).sum
    val want = counts.map { case (l, n) =>
      l -> math.floor(BigDecimal(90.0 * math.sqrt(n.toDouble) / tw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
    }
    assert(got === want)
    // skew is rebalanced: lang2's share of quota exceeds its share of docs
    val qTot = got.values.sum.toDouble
    val nTot = counts.values.sum.toDouble
    assert(got("lang2") / qTot > counts("lang2") / nTot,
      "sqrt temperature must up-weight the smallest stratum")
  }

  test("planAndSelect delivers exactly quota_s members per stratum — " +
      "the per-stratum smallest stsample keys — and matches the " +
      "corpus-side selection law") {
    val all = docs(700)
    val (ro, st) = artifacts(all, k = 60)
    val sel = MixturePlan.planAndSelect(spark, ro, st, targetTotal = 120)
    val quotas = MixturePlan.quotasFromRollup(spark, ro, 120)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = sel.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(byLang.view.mapValues(_.size.toLong).toMap === quotas)
    // law: per stratum, the quota_s smallest stsample keys of the corpus
    val keys = all.select($"lang",
        StratifiedSample.sampleKey($"doc_id").as("skey"), $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    quotas.foreach { case (lang, q) =>
      val want = keys.filter(_._1 == lang).sortBy(t => (t._2, t._3))
        .take(q.toInt).map(_._3).toSet
      assert(byLang(lang) === want, s"$lang must take the smallest keys")
    }
    // and the delivered total is the sum of quotas (≈ target, floor slack)
    assert(sel.count() === quotas.values.sum)
  }

  test("selection-set law differs from temperatureMixture's ids only by " +
      "salt: same sizes per stratum under the same quota math") {
    val all = docs(700)
    val (ro, st) = artifacts(all, k = 60)
    val atRest = MixturePlan.planAndSelect(spark, ro, st, targetTotal = 100)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = Sampling.temperatureMixture(all, targetTotal = 100,
        sourceCol = "lang")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(atRest === oneShot,
      "both selections deliver the same per-stratum quota counts")
  }

  test("a quota the sample cannot serve is refused loudly, never " +
      "silently under-delivered") {
    val all = docs(700)
    val (ro, st) = artifacts(all, k = 10) // k too small for target 300
    val e = intercept[IllegalArgumentException] {
      MixturePlan.planAndSelect(spark, ro, st, targetTotal = 300)
    }
    assert(e.getMessage.contains("cannot serve"))
  }

  test("no corpus relation anywhere in the decision plan: every file " +
      "scan reads one of the two artifacts") {
    val all = docs(700)
    val (ro, st) = artifacts(all, k = 60)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[String] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString).toSeq
      case other =>
        (other.children ++ other.subqueries).flatMap(scans)
    }
    // the quota half is localCheckpoint-materialized inside
    // planAndSelect (the bounded relation is consumed by both the
    // provisioning check and the selection join), so the decision is
    // gated in its two halves: the quota derivation must scan ONLY
    // the rollup, the selection ONLY the sample (plus the
    // materialized quota leaf, which is not a file scan at all).
    val quotas = MixturePlan.quotasFromRollup(spark, ro, targetTotal = 120)
    val qRoots = scans(quotas.queryExecution.executedPlan)
    assert(qRoots.nonEmpty, "the quota plan must scan the rollup")
    assert(qRoots.forall(_.contains(ro)),
      s"a non-rollup relation leaked into the quota plan:\n$qRoots")
    val sel = MixturePlan.planAndSelect(spark, ro, st, targetTotal = 120)
    val roots = scans(sel.queryExecution.executedPlan)
    assert(roots.nonEmpty, "the decision must scan the sample artifact")
    assert(roots.forall(p => p.contains(ro) || p.contains(st)),
      s"a non-artifact relation leaked into the decision plan:\n$roots")
    assert(roots.exists(_.contains(st)), "the sample feeds the decision")
  }
}
