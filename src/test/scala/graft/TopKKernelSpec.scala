package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** The two batch-ANN hot-path kernels added in r12:
  * `int8_cosine` (one codegen pass ≡ three interpreted HOF dots) and
  * `top_k_struct` (partial-aggregable bounded heap ≡ per-key
  * row_number rank). Equality is asserted BIT-FOR-BIT / row-for-row —
  * both kernels replaced certified formulations, so any divergence is
  * a bug, not tolerance. */
class TopKKernelSpec extends SparkTestBase {
  import spark.implicits._

  private def quantized = Similarity.quantizeInt8(
    Tables.embeddings(spark, sfDir).limit(300))

  test("int8_cosine kernel equals the HOF formulation bit-for-bit") {
    GraftExtensions.register(spark)
    val qz = quantized
    val pairs = qz.select($"vec_id".as("ia"), $"q_codes".as("ca"))
      .crossJoin(qz.select($"q_codes".as("cb")).limit(7))
    val diff = pairs.select(
      call_function("int8_cosine", $"ca", $"cb").as("fast"),
      Similarity.int8CosineHof($"ca", $"cb").as("ref"))
      .where($"fast" =!= $"ref")
      .count()
    assert(diff == 0)
  }

  test("int8_cosine accepts mixed integral widths and propagates nulls") {
    GraftExtensions.register(spark)
    // bigint literal vs tinyint column — the topKInt8FromIndex shape
    val r = spark.sql(
      """SELECT int8_cosine(array(CAST(3 AS TINYINT), CAST(-4 AS TINYINT)),
        |                   array(3L, -4L)) AS s""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    val n = spark.sql(
      "SELECT int8_cosine(CAST(NULL AS ARRAY<TINYINT>), array(1L)) AS s").head()
    assert(n.isNullAt(0))
    val en = spark.sql(
      """SELECT int8_cosine(array(CAST(1 AS TINYINT), CAST(NULL AS TINYINT)),
        |                   array(1L, 2L)) AS s""".stripMargin).head()
    assert(en.isNullAt(0), "null ELEMENT must null the similarity (HOF parity)")
  }

  test("int8_cosine participates in whole-stage codegen") {
    GraftExtensions.register(spark)
    val df = quantized.select(
      call_function("int8_cosine", $"q_codes", $"q_codes").as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined, s"no codegen span:\n$plan")
  }

  test("top_k_struct equals the row_number rank — rows, order and ranks") {
    GraftExtensions.register(spark)
    val qz = quantized
    // a small all-pairs cosine table: ~300 queries × 40 candidates
    val scored = qz.select($"vec_id".as("q_id"), $"q_codes".as("qa"))
      .crossJoin(qz.where($"vec_id" % 7 === 0)
        .select($"vec_id".as("cand_id"), $"q_codes".as("qb")))
      .where($"q_id" =!= $"cand_id")
      .select($"q_id", $"cand_id",
        call_function("int8_cosine", $"qa", $"qb").as("sim"))
    val viaWindow = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"sim".desc, $"cand_id".asc)))
      .where($"rank" <= 5)
      .select($"q_id", $"cand_id", $"sim", $"rank".cast("int"))
    val viaHeap = scored
      // many small partitions force partial buffers + serde merges
      .repartition(13)
      .groupBy($"q_id")
      .agg(call_function("top_k_struct",
        struct($"sim", $"cand_id"), lit(5), lit(true)).as("_tk"))
      .select($"q_id", posexplode($"_tk").as(Seq("_p", "_r")))
      .select($"q_id", $"_r.cand_id".as("cand_id"), $"_r.sim".as("sim"),
        ($"_p" + 1).cast("int").as("rank"))
    assert(viaWindow.exceptAll(viaHeap).isEmpty && viaHeap.exceptAll(viaWindow).isEmpty,
      "heap top-k diverged from the window rank")
  }

  test("top_k_struct ascending mode keeps the k smallest") {
    GraftExtensions.register(spark)
    val df = Seq((1L, 3.0, 10L), (1L, 1.0, 11L), (1L, 2.0, 12L), (1L, 1.0, 9L),
      (2L, 5.0, 20L)).toDF("g", "d", "id")
    val out = df.groupBy($"g")
      .agg(call_function("top_k_struct", struct($"d", $"id"), lit(2), lit(false))
        .as("tk"))
      .select($"g", $"tk".cast("array<struct<d:double,id:bigint>>"))
      .as[(Long, Seq[(Double, Long)])].collect().toMap
    assert(out(1L) == Seq((1.0, 9L), (1.0, 11L))) // d ASC, id ASC tie-break
    assert(out(2L) == Seq((5.0, 20L)))            // group smaller than k
  }

  test("top_k_struct aggregates map-side (partial before the shuffle)") {
    GraftExtensions.register(spark)
    val qz = quantized
    val df = qz.select($"vec_id".as("q_id"), $"q_codes")
      .crossJoin(qz.select($"q_codes".as("cb")).limit(11))
      .select($"q_id", call_function("int8_cosine", $"q_codes", $"cb").as("sim"))
      .groupBy($"q_id")
      .agg(call_function("top_k_struct", struct($"sim", $"q_id"), lit(3), lit(true))
        .as("tk"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate appears twice: partial (pre-shuffle) + final
    assert("(?i)objecthashaggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
  }
}
