package graft

import org.apache.spark.sql.functions._

import graft.operators.HistogramSketch

/** At-rest fixed-bin histogram quantiles: the read-off returns the
  * bin containing the ceil(q·N)-th smallest value; merges are exact;
  * the replay marker is load-bearing; clamping is the stated trade. */
class HistogramSketchSpec extends SparkTestBase {

  private def quantiles(dir: String, qs: Seq[Double]) =
    HistogramSketch.quantilesFromSketch(spark, dir, qs)
      .collect()
      .map(r => r.getAs[Double]("q") ->
        ((r.getAs[Int]("bin"), r.getAs[Long]("cum_n"),
          r.getAs[Long]("n_total")))).toMap

  test("read-off bin contains the ceil(q·N)-th smallest; append ≡ one-shot; compaction safe") {
    import spark.implicits._
    val values = (1 to 1000).map(_.toDouble)
    val df = values.toDF("v").withColumn("id", monotonically_increasing_id())
    val dir = java.nio.file.Files.createTempDirectory("hist_rt").toString
    // geometry [0, 1000)/100 → width 10; value v lands in bin
    // floor(v/10) (1000.0 clamps to bin 99)
    HistogramSketch.writeSketch(df.where(col("id") % 2 === 0), "v", dir,
      lo = 0.0, hi = 1000.0, nBins = 100)
    HistogramSketch.appendToSketch(df.where(col("id") % 2 === 1), dir,
      doneMarker = Some("m1"))
    val got = quantiles(dir, Seq(0.1, 0.5, 0.9, 1.0))
    for ((q, (bin, cum, total)) <- got) {
      assert(total === 1000L)
      val target = math.ceil(q * 1000).toLong
      val exact = values.sorted.apply((target - 1).toInt)
      val lo = bin * 10.0; val hi = (bin + 1) * 10.0
      assert(exact >= lo && (exact < hi || bin == 99),
        s"q=$q: ${target}th value $exact outside bin $bin [$lo,$hi)")
      assert(cum >= target)
    }
    // marked replay no-op, then compaction read-equivalent
    HistogramSketch.appendToSketch(df.where(col("id") % 2 === 1), dir,
      doneMarker = Some("m1"))
    assert(quantiles(dir, Seq(0.5)) === got.view.filterKeys(_ == 0.5).toMap)
    HistogramSketch.compactSketch(spark, dir)
    assert(spark.read.parquet(s"$dir/bins").count() <= 100L)
    assert(quantiles(dir, Seq(0.1, 0.5, 0.9, 1.0)) === got)
    // UNMARKED replay doubles N — the documented sum-merge failure
    HistogramSketch.appendToSketch(df.where(col("id") % 2 === 1), dir,
      doneMarker = None)
    assert(quantiles(dir, Seq(1.0))(1.0)._3 === 1500L)
  }

  test("NaN values are dropped alongside nulls, never routed to the top bin") {
    import spark.implicits._
    val df = Seq(Some(5.0), Some(Double.NaN), None, Some(95.0)).toDF("v")
    val dir = java.nio.file.Files.createTempDirectory("hist_nan").toString
    HistogramSketch.writeSketch(df, "v", dir, lo = 0.0, hi = 100.0,
      nBins = 10)
    val bins = spark.read.parquet(s"$dir/bins").collect()
      .map(r => r.getAs[Int]("bin") -> r.getAs[Long]("n")).toMap
    assert(bins === Map(0 -> 1L, 9 -> 1L),
      s"NaN/null must not count (Spark orders NaN above all values, so " +
        s"an unfiltered clamp would land it in bin 9): $bins")
  }

  test("out-of-range values clamp to the edge bins (stated trade)") {
    import spark.implicits._
    val df = Seq(-50.0, 0.0, 5.0, 99.0, 250.0).toDF("v")
    val dir = java.nio.file.Files.createTempDirectory("hist_clamp").toString
    HistogramSketch.writeSketch(df, "v", dir, lo = 0.0, hi = 100.0,
      nBins = 10)
    val bins = HistogramSketch.readBins(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bins(0) === 3L) // −50 clamps up, 0 and 5 land
    assert(bins(9) === 2L) // 99 lands, 250 clamps down
  }

  test("retraction is an exact inverse: quantile read-offs equal an " +
      "artifact that never ingested the batch") {
    import spark.implicits._
    val all = (1 to 1000).map(_.toDouble).toDF("v")
      .withColumn("id", monotonically_increasing_id())
    val keep = all.where(col("id") % 2 === 0)
    val bad = all.where(col("id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("hist_rtr").toString
    val ref = java.nio.file.Files.createTempDirectory("hist_rref").toString
    HistogramSketch.writeSketch(keep, "v", dir, lo = 0.0, hi = 1000.0,
      nBins = 100)
    HistogramSketch.appendToSketch(bad, dir, doneMarker = Some("b1"))
    HistogramSketch.retractFromSketch(bad, dir, doneMarker = Some("rt1"))
    HistogramSketch.writeSketch(keep, "v", ref, lo = 0.0, hi = 1000.0,
      nBins = 100)
    val qs = Seq(0.25, 0.5, 0.9)
    assert(quantiles(dir, qs) === quantiles(ref, qs),
      "retract must equal rebuild-without, quantile for quantile")
    // replayed retraction: gated no-op
    HistogramSketch.retractFromSketch(bad, dir, doneMarker = Some("rt1"))
    assert(quantiles(dir, qs) === quantiles(ref, qs))
  }

  test("drift check: identical distribution reads tvd 0; a fully moved " +
      "one reads 1; a half-swap reads its exact mass; empty batch is " +
      "null, never a crash") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hist_drift").toString
    // reference: 100 values in bin 0, 100 in bin 5
    val ref = ((1 to 100).map(_ => 1.0) ++ (1 to 100).map(_ => 55.0))
      .toDF("v")
    HistogramSketch.writeSketch(ref, "v", dir, lo = 0.0, hi = 100.0,
      nBins = 10)
    def tvdOf(batch: org.apache.spark.sql.DataFrame): Option[Double] = {
      val r = HistogramSketch.driftFromSketch(dir, batch, 0.25).collect()
      assert(r.length === 1)
      if (r(0).isNullAt(3)) None else Some(r(0).getDouble(3))
    }
    // same shape (scaled): tvd 0, not drifted
    assert(tvdOf(Seq(1.0, 55.0).toDF("v")) === Some(0.0))
    // all mass moved to an unseen bin: tvd 1
    assert(tvdOf(Seq(99.0, 98.0).toDF("v")) === Some(1.0))
    // half the batch mass moved (ref is 50/50 bins 0+5; batch all bin 0):
    // tvd = |1−0.5|/... = 0.5
    assert(tvdOf(Seq(1.0, 2.0).toDF("v")) === Some(0.5))
    val decided = HistogramSketch.driftFromSketch(dir,
      Seq(1.0, 2.0).toDF("v"), 0.25).select("drifted").head().getBoolean(0)
    assert(decided, "0.5 > 0.25 must flag drift")
    // empty batch: null tvd/drifted — a degenerate ingest must not NPE
    assert(tvdOf(Seq.empty[Double].toDF("v")) === None)
    // exact numerator: batch (2,0) vs ref (100,100) → Σ|n·M−m·N| =
    // |2·200−100·2| + |0−100·2| = 200+200 = 400
    val num = HistogramSketch.driftFromSketch(dir, Seq(1.0, 2.0).toDF("v"),
      0.25).select("l1_num").head().getDecimal(0)
    assert(num.longValueExact() === 400L)
  }

  test("grouped sketch: per-group quantiles match per-group direct " +
      "computation; append ≡ rebuild; retraction exact; group " +
      "partition pruning") {
    import spark.implicits._
    // group g0: values 1..100; g1: values 201..400 — distinct medians
    val df = ((1 to 100).map(v => ("g0", v.toDouble)) ++
      (201 to 400).map(v => ("g1", v.toDouble)))
      .toDF("src", "v").withColumn("id", monotonically_increasing_id())
    val dir = java.nio.file.Files.createTempDirectory("gh_rt").toString
    HistogramSketch.writeGroupedSketch(df.where(col("id") % 2 === 0),
      "v", "src", dir, lo = 0.0, hi = 500.0, nBins = 100)
    HistogramSketch.appendToGroupedSketch(df.where(col("id") % 2 === 1),
      dir, Some("m1"))
    HistogramSketch.appendToGroupedSketch(df.where(col("id") % 2 === 1),
      dir, Some("m1")) // replay — gated
    val got = HistogramSketch.groupedQuantiles(spark, dir, Seq(0.5))
      .collect().map(r => r.getAs[String]("src") ->
        ((r.getAs[Int]("bin"), r.getAs[Long]("n_total")))).toMap
    // g0 median = 50 → bin 10 (width 5); g1 median = 300 → bin 60
    assert(got === Map("g0" -> ((10, 100L)), "g1" -> ((60, 200L))))
    // retraction: remove g1's odd-id half; its quantile shifts to the
    // rebuild-without value while g0 is untouched
    val g1odd = df.where(col("src") === "g1" && col("id") % 2 === 1)
    HistogramSketch.retractFromGroupedSketch(g1odd, dir, Some("rt1"))
    val ref = java.nio.file.Files.createTempDirectory("gh_ref").toString
    HistogramSketch.writeGroupedSketch(
      df.where(col("src") === "g0")
        .union(df.where(col("src") === "g1" && col("id") % 2 === 0)),
      "v", "src", ref, lo = 0.0, hi = 500.0, nBins = 100)
    val q = (d: String) => HistogramSketch.groupedQuantiles(spark, d,
        Seq(0.5)).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getLong(4))).sorted.toSeq
    assert(q(dir) === q(ref), "grouped retract ≡ rebuild-without")
    // a single group's bins read through a partition-pruned scan
    val one = spark.read.parquet(s"$dir/bins").where(col("src") === "g0")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("src#"),
      s"the group must travel as a partition filter:\n$plan")
  }

  test("grouped drift: only the moved source flags; an unseen source " +
      "reads tvd 1.0; reference-only sources are absent") {
    import spark.implicits._
    val ref = ((1 to 100).map(_ => ("a", 5.0)) ++
      (1 to 100).map(_ => ("b", 55.0)) ++
      (1 to 50).map(_ => ("quiet", 25.0))).toDF("src", "v")
    val dir = java.nio.file.Files.createTempDirectory("gh_dr").toString
    HistogramSketch.writeGroupedSketch(ref, "v", "src", dir,
      lo = 0.0, hi = 100.0, nBins = 10)
    // batch: a unchanged, b fully moved, c never seen; quiet absent
    val batch = (Seq(("a", 5.0), ("a", 6.0)) ++
      Seq(("b", 95.0), ("b", 96.0)) ++ Seq(("c", 15.0))).toDF("src", "v")
    val got = HistogramSketch.groupedDriftFromSketch(dir, batch, 0.25)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("tvd"), r.getAs[Boolean]("drifted")))).toMap
    assert(got.keySet === Set("a", "b", "c"),
      "batch groups only — the quiet reference-only source is absent")
    assert(got("a") === ((0.0, false)), "unmoved source must not flag")
    assert(got("b") === ((1.0, true)), "fully moved source reads 1.0")
    assert(got("c") === ((1.0, true)), "an unseen source is maximal drift")
  }

  test("quantile-threshold curation keeps exactly the at-or-above-edge " +
      "rows as one broadcast-scalar filter (no stat pass at decision " +
      "time)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hist_cur").toString
    val corpus = (1 to 1000).map(_.toDouble).toDF("v")
    HistogramSketch.writeSketch(corpus, "v", dir, lo = 0.0, hi = 1000.0,
      nBins = 100)
    // q=0.3 → 300th smallest = 300.0 → bin 30 → edge 300.0
    assert(HistogramSketch.thresholdFromSketch(spark, dir, 0.3) === 300.0)
    val kept = HistogramSketch.curateByQuantile(
      corpus.union(Seq(Double.NaN).toDF("v")), dir, 0.3)
    assert(kept.count() === 701L, "300.0..1000.0 inclusive; NaN dropped")
    assert(kept.agg(min("v")).head().getDouble(0) === 300.0)
    // the decision plan reads only the tiny bins relation up front;
    // the corpus pass is a plain filter — no exchange above the scan
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"curation must be a map-only filter over the corpus:\n$plan")
  }
}
