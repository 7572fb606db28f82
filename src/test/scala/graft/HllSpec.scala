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
