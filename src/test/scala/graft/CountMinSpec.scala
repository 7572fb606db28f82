package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Count-Min sketch: estimates are partitioning-INVARIANT (merges are
  * exact element-wise adds), never below the true count, and the SQL
  * `estimate`/`cellIndex` readout agrees with the aggregator's own
  * JVM-side hashing. */
class CountMinSpec extends SparkTestBase {

  private val W = 64
  private val D = 3

  private def sketchOf(texts: Seq[String], parts: Int): Array[Long] = {
    import spark.implicits._
    spark.createDataset(texts).repartition(parts).toDF("text")
      .agg(CountMin.countMin(W, D)(col("text")))
      .collect()(0).getSeq[Long](0).toArray
  }

  test("sketch is identical under 1, 3, and 11 partitions") {
    val rnd = new scala.util.Random(5)
    val texts = (0 until 200).map(_ =>
      (0 until 30).map(_ => s"t${rnd.nextInt(300)}").mkString(" "))
    val ref = sketchOf(texts, 1)
    for (p <- Seq(3, 11))
      assert(sketchOf(texts, p).sameElements(ref), s"parts=$p differs")
  }

  test("estimates never undercount; exact when width clears the vocabulary") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val texts = (0 until 150).map(_ =>
      (0 until 20).map(_ => s"w${rnd.nextInt(500)}").mkString(" "))
    val exact = texts.flatMap(_.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val df = spark.createDataset(texts).repartition(4).toDF("text")
    val sk = df.agg(CountMin.countMin(W, D)(col("text")).as("cms"))
    val words = exact.keys.toSeq.toDF("w")
    val est = words.crossJoin(broadcast(sk))
      .select(col("w"), CountMin.estimate(col("cms"), col("w"), W, D).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 500-word vocabulary in 64 cells: collisions guaranteed, but the
    // estimate must never fall below the truth
    exact.foreach { case (w, c) =>
      assert(est(w) >= c, s"$w undercounted: ${est(w)} < $c")
    }
    // wide sketch (no collisions likely per row-min): exact counts
    val wide = 1 << 14
    val sk2 = df.agg(CountMin.countMin(wide, D)(col("text")).as("cms"))
    val est2 = words.crossJoin(broadcast(sk2))
      .select(col("w"), CountMin.estimate(col("cms"), col("w"), wide, D).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, c) =>
      assert(est2(w) === c, s"$w: wide sketch ${est2(w)} != $c")
    }
  }

  test("absent tokens estimate only colliding mass (usually zero when wide)") {
    import spark.implicits._
    val df = Seq("a b c a").toDF("text")
    val sk = df.agg(CountMin.countMin(1 << 12, 4)(col("text")).as("cms"))
    val est = Seq("zebra").toDF("w").crossJoin(broadcast(sk))
      .select(CountMin.estimate(col("cms"), col("w"), 1 << 12, 4))
      .collect()(0).getLong(0)
    assert(est === 0L)
  }

  // --- the at-rest artifact (probe x125's machinery) ---------------

  private def estimates(path: String, words: Seq[String]): Map[String, Long] = {
    import spark.implicits._
    CountMin.estimateFromSketch(spark, path, words.toDF("w"), "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("at-rest: build+append ≡ one-shot; wide sketch exact; compaction read-equivalent") {
    import spark.implicits._
    val texts = (0 until 120).map(i =>
      (0 until 10).map(j => s"w${(i * 7 + j * 13) % 90}").mkString(" "))
    val df = spark.createDataset(texts).toDF("text")
      .withColumn("id", monotonically_increasing_id())
    val exact = texts.flatMap(_.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val dir = java.nio.file.Files.createTempDirectory("cms_rt").toString

    // wide enough that min-over-depth sees no collisions → exact
    CountMin.writeSketch(df.where(col("id") % 2 === 0), "text", dir,
      width = 1 << 14, depth = 4)
    CountMin.appendToSketch(df.where(col("id") % 2 === 1), dir,
      doneMarker = Some("m1"))
    val words = exact.keys.toSeq
    assert(estimates(dir, words) === exact)

    // compaction collapses per-batch cells, values unchanged
    CountMin.compactSketch(spark, dir)
    assert(spark.read.parquet(s"$dir/cells").count() <=
      (1L << 14) * 4)
    assert(estimates(dir, words) === exact)
  }

  test("at-rest: the replay marker is LOAD-BEARING — sum-merge is not idempotent") {
    import spark.implicits._
    val df = Seq("a a b", "b c").toDF("text")
    val dir = java.nio.file.Files.createTempDirectory("cms_replay").toString
    CountMin.writeSketch(df.limit(0), "text", dir, width = 1 << 10, depth = 3)
    CountMin.appendToSketch(df, dir, doneMarker = Some("b1"))
    val once = estimates(dir, Seq("a", "b", "c"))
    assert(once === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    // marked replay: gated, nothing lands
    CountMin.appendToSketch(df, dir, doneMarker = Some("b1"))
    assert(estimates(dir, Seq("a", "b", "c")) === once)
    // UNMARKED replay: double-counts — the documented failure mode a
    // marker-less at-least-once scheduler buys itself
    CountMin.appendToSketch(df, dir, doneMarker = None)
    assert(estimates(dir, Seq("a", "b", "c")) ===
      Map("a" -> 4L, "b" -> 4L, "c" -> 2L))
  }

  test("at-rest: append geometry comes off the artifact, not the caller") {
    import spark.implicits._
    val df = Seq("x y").toDF("text")
    val dir = java.nio.file.Files.createTempDirectory("cms_meta").toString
    CountMin.writeSketch(df, "text", dir, width = 128, depth = 2)
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    assert(meta.getInt(0) === 128 && meta.getInt(1) === 2 &&
      meta.getString(2) === "text")
    // an appended batch is hashed under the persisted 128×2 geometry;
    // estimates stay consistent with the original build
    CountMin.appendToSketch(df, dir, doneMarker = Some("g"))
    assert(estimates(dir, Seq("x")) === Map("x" -> 2L))
  }

  test("at-rest: retraction is an exact inverse — reads equal an " +
      "artifact that never ingested the batch; replayed retraction " +
      "is a no-op; compaction preserves it") {
    import spark.implicits._
    val texts = (0 until 100).map(i =>
      (0 until 8).map(j => s"w${(i * 5 + j * 11) % 70}").mkString(" "))
    val df = spark.createDataset(texts).toDF("text")
      .withColumn("id", monotonically_increasing_id())
    val keep = df.where(col("id") % 2 === 0)
    val bad = df.where(col("id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("cms_rtr").toString
    val ref = java.nio.file.Files.createTempDirectory("cms_ref").toString
    CountMin.writeSketch(keep, "text", dir, width = 1 << 14, depth = 4)
    CountMin.appendToSketch(bad, dir, doneMarker = Some("b1"))
    // the contaminated source is found and withdrawn
    CountMin.retractFromSketch(bad, dir, doneMarker = Some("rt1"))
    CountMin.writeSketch(keep, "text", ref, width = 1 << 14, depth = 4)
    val words = (0 until 70).map(i => s"w$i")
    assert(estimates(dir, words) === estimates(ref, words),
      "retract must equal rebuild-without, estimate for estimate")
    // replayed retraction (at-least-once redelivery): gated no-op
    CountMin.retractFromSketch(bad, dir, doneMarker = Some("rt1"))
    assert(estimates(dir, words) === estimates(ref, words))
    // compaction folds the negative cells away, values unchanged
    CountMin.compactSketch(spark, dir)
    assert(estimates(dir, words) === estimates(ref, words))
  }
}
