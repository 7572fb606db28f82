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
}
