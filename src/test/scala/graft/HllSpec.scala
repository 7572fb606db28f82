package graft

import org.apache.spark.sql.functions._

import graft.operators.Hll
import graft.sources.Tables

/** HyperLogLog registers + estimator: mergeability, partition
  * invariance, accuracy vs exact distinct counts, and the degenerate
  * contracts (empty, all-null, single value). */
class HllSpec extends SparkTestBase {

  private def regs(df: org.apache.spark.sql.DataFrame) =
    Hll.registers(df, col("v"), p = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq

  private def est(df: org.apache.spark.sql.DataFrame): Double =
    Hll.estimate(Hll.registers(df, col("v"), p = 8), p = 8)
      .head().getDouble(2)

  private def strings(n: Long) =
    spark.range(n).select(concat(lit("val_"), col("id")).as("v"))

  test("registers are partition-invariant") {
    val df = strings(2000)
    assert(regs(df) === regs(df.repartition(13)))
    assert(regs(df) === regs(df.coalesce(1)))
  }

  test("shard merge == global sketch, for any shard split") {
    val df = strings(3000).withColumn("k", monotonically_increasing_id())
    val whole = regs(df)
    val merged3 = Hll.merge(
        Hll.registers(df.where(col("k") % 3 === 0), col("v"), 8),
        Hll.registers(df.where(col("k") % 3 === 1), col("v"), 8),
        Hll.registers(df.where(col("k") % 3 === 2), col("v"), 8))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(merged3 === whole)
    // idempotent: merging a sketch with itself changes nothing
    val a = Hll.registers(df, col("v"), 8)
    val self = Hll.merge(a, a)
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(self === whole)
  }

  test("estimate tracks exact distinct counts within the p=8 error band") {
    // deterministic hash → deterministic estimates; 1.04/sqrt(256) =
    // 6.5% is the theoretical stddev, 15% a ~2.3σ band
    for (n <- Seq(100L, 1000L, 5000L, 20000L)) {
      val e = est(strings(n))
      assert(math.abs(e - n) / n <= 0.15, s"n=$n estimate=$e")
    }
    // duplicates don't move the estimate: 3 copies of 1000 values
    val dups = strings(1000).unionAll(strings(1000)).unionAll(strings(1000))
    assert(est(dups) === est(strings(1000)))
  }

  test("degenerate inputs: empty -> 0, all-null -> 0, one value -> ~1") {
    import spark.implicits._
    assert(est(strings(0)) === 0.0) // V = m, linear counting m·ln(1)
    val nulls = Seq.fill(5)(null.asInstanceOf[String]).toDF("v")
    assert(est(nulls) === 0.0)
    val one = est(Seq("solo").toDF("v"))
    // linear counting: 256·ln(256/255)
    assert(math.abs(one - 256.0 * math.log(256.0 / 255.0)) < 1e-6)
  }

  test("registers stay densified and bounded through merge") {
    val a = Hll.registers(strings(50), col("v"), 8)
    val b = Hll.registers(strings(500), col("v"), 8)
    val m = Hll.merge(a, b).collect()
    assert(m.length === 256)
    assert(m.map(_.getInt(0)).toSet === (0 until 256).toSet)
    assert(m.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 49))
  }

  test("grouped: shard mergeBy == global registersBy; estimateBy matches " +
      "the per-group single-key estimate; sparse == densified estimator") {
    val df = strings(3000)
      .withColumn("g", concat(lit("g"), pmod(crc32(col("v")), lit(4))))
    def groupedRegs(d: org.apache.spark.sql.DataFrame) =
      Hll.registersBy(d, col("v"), Seq("g"), p = 8).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val whole = groupedRegs(df)
    // sparse: only observed buckets, rho >= 1
    assert(whole.forall(_._3 >= 1))
    val merged = Hll.mergeBy(Seq("g"),
        Hll.registersBy(df.where(crc32(col("v")) % 3 === 0), col("v"), Seq("g")),
        Hll.registersBy(df.where(crc32(col("v")) % 3 === 1), col("v"), Seq("g")),
        Hll.registersBy(df.where(crc32(col("v")) % 3 === 2), col("v"), Seq("g")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(merged === whole)
    // per-group estimates == the global single-key estimator run on
    // each group alone (grouping must not change any group's math)
    val byGroup = Hll.estimateBy(
        Hll.registersBy(df, col("v"), Seq("g")), Seq("g"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    byGroup.keys.foreach { g =>
      val single = Hll.estimate(
        Hll.registers(df.where(col("g") === g), col("v"), 8), 8).head()
      assert(byGroup(g) ===
        ((single.getLong(0), single.getLong(1), single.getDouble(2))),
        s"group $g diverges from the single-key estimator")
    }
    // estimateBy degrades gracefully to DENSIFIED input: padding a
    // group's registers with explicit rho-0 rows changes nothing
    import spark.implicits._
    val sparse = Hll.registersBy(df.where(col("g") === "g0"), col("v"), Seq("g"))
    val present = sparse.select("bucket").as[Int].collect().toSet
    val pad = (0 until 256).filterNot(present)
      .map(b => ("g0", b, 0)).toDF("g", "bucket", "rho")
    val dense = sparse.unionByName(pad)
    val a = Hll.estimateBy(sparse, Seq("g")).head()
    val b = Hll.estimateBy(dense, Seq("g")).head()
    assert((a.getLong(1), a.getLong(2), a.getDouble(3)) ===
      ((b.getLong(1), b.getLong(2), b.getDouble(3))))
  }

  test("at-rest sketch: write + append ≡ registersBy over the union; " +
    "estimates ride the persisted geometry") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_sk").toString
    Hll.writeSketch(docs.where(col("doc_id") % 2 === 0), "text",
      Seq("lang"), dir, p = 8)
    Hll.appendToSketch(docs.where(col("doc_id") % 2 === 1), dir,
      doneMarker = Some("d1"))
    val persisted = Hll.readRegisters(spark, dir)
      .select("lang", "bucket", "rho")
      .as[(String, Int, Int)].collect().toSeq.sorted
    val fromRaw = Hll.registersBy(docs, col("text"), Seq("lang"), p = 8)
      .select("lang", "bucket", "rho")
      .as[(String, Int, Int)].collect().toSeq.sorted
    assert(persisted == fromRaw, "persisted-merged registers != from-raw")
    val est = Hll.estimateFromSketch(spark, dir)
      .select("lang", "estimate").as[(String, Double)].collect().toMap
    val direct = Hll.estimateBy(
        Hll.registersBy(docs, col("text"), Seq("lang"), p = 8), Seq("lang"))
      .select("lang", "estimate").as[(String, Double)].collect().toMap
    assert(est == direct)
  }

  test("at-rest sketch: replays are row-level no-ops with the marker and " +
    "VALUE-harmless even without it") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_rp").toString
    Hll.writeSketch(docs.where(col("doc_id") < 100), "text", Seq("lang"), dir)
    val batch = docs.where(col("doc_id") >= 100 && col("doc_id") < 200)
    Hll.appendToSketch(batch, dir, doneMarker = Some("m1"))
    val rows = spark.read.parquet(s"$dir/registers").count()
    Hll.appendToSketch(batch, dir, doneMarker = Some("m1")) // marker replay
    assert(spark.read.parquet(s"$dir/registers").count() == rows,
      "marker-gated replay appended rows")
    val before = Hll.estimateFromSketch(spark, dir)
      .select("lang", "estimate").as[(String, Double)].collect().toMap
    Hll.appendToSketch(batch, dir) // unguarded replay: rows land...
    assert(Hll.estimateFromSketch(spark, dir)
      .select("lang", "estimate").as[(String, Double)].collect().toMap ==
      before, "...but max-merge must absorb them")
  }

  test("at-rest sketch: compaction merges rows back to one set per group") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_cp").toString
    Hll.writeSketch(docs.where(col("doc_id") < 150), "text", Seq("lang"), dir)
    Hll.appendToSketch(docs.where(col("doc_id") >= 150 && col("doc_id") < 300),
      dir, doneMarker = Some("c1"))
    Hll.appendToSketch(docs.where(col("doc_id") >= 300), dir,
      doneMarker = Some("c2"))
    val before = Hll.estimateFromSketch(spark, dir)
      .select("lang", "estimate").as[(String, Double)].collect().toMap
    val rowsBefore = spark.read.parquet(s"$dir/registers").count()
    Hll.compactSketch(spark, dir)
    val rowsAfter = spark.read.parquet(s"$dir/registers").count()
    assert(rowsAfter <= rowsBefore, "compaction grew the registers")
    // post-compaction rows are the MERGED set: (group, bucket) unique
    val dupes = spark.read.parquet(s"$dir/registers")
      .groupBy("lang", "bucket").count().where(col("count") > 1).count()
    assert(dupes == 0, "compaction left unmerged (group, bucket) rows")
    assert(Hll.estimateFromSketch(spark, dir)
      .select("lang", "estimate").as[(String, Double)].collect().toMap ==
      before, "compaction changed estimates")
  }

  test("grouped registers plan: partial-aggregable max, one exchange, no window") {
    val plan = Hll.registersBy(Tables.documents(spark, sfDir),
        col("text"), Seq("lang"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"grouped register max not partial-aggregable:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
      s"unexpected heavyweight node:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"more than the one (group, bucket) exchange:\n$plan")
  }

  test("estimate plan: one partial agg over the sketch, scan-side max per bucket") {
    val df = Tables.documents(spark, sfDir)
    val plan = Hll.registers(df, col("text"), 8)
      .queryExecution.executedPlan.toString
    // the corpus-side shape: map projection + partial max before the
    // single bucket exchange; no window, no product join
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"register max not partial-aggregable:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
      s"unexpected heavyweight node:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"more than the one bucket exchange:\n$plan")
  }
}
