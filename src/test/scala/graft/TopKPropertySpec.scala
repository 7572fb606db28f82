package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property tests for the r12 bounded-heap kernels: random corpora
  * pushed through the REAL aggregation paths (forced repartitions so
  * partial buffers serialize and merge) and compared against the
  * window-rank reference row for row. Seeded RNG — failures replay. */
class TopKPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("top_k_struct equals the window rank on random skewed corpora") {
    GraftExtensions.register(spark)
    val rnd = new Random(42)
    for (trial <- 1 to 3) {
      val k = 1 + rnd.nextInt(7)
      val nGroups = 1 + rnd.nextInt(40)
      // skew: group 0 gets a large share (the hot-query shape);
      // duplicate scores force the id tie-break to matter
      val rows = (1 to 4000).map { i =>
        val g = if (rnd.nextInt(3) == 0) 0L else rnd.nextInt(nGroups).toLong
        (g, rnd.nextInt(50).toDouble / 7.0, i.toLong)
      }
      val df = rows.toDF("g", "score", "id").repartition(7 + trial)
      val viaHeap = df.groupBy($"g")
        .agg(call_function("top_k_struct",
          struct($"score", $"id"), lit(k), lit(true)).as("_tk"))
        .select($"g", posexplode($"_tk").as(Seq("_p", "_r")))
        .select($"g", $"_r.id".as("id"), $"_r.score".as("score"),
          ($"_p" + 1).cast("int").as("rank"))
      val viaWindow = df
        .withColumn("rank", row_number().over(
          Window.partitionBy($"g").orderBy($"score".desc, $"id".asc))
          .cast("int"))
        .where($"rank" <= k)
        .select($"g", $"id", $"score", $"rank")
      assert(viaHeap.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(viaHeap).isEmpty,
        s"trial $trial (k=$k, groups=$nGroups) diverged from the window")
    }
  }

  test("int8_cosine equals the HOF reference on random code arrays incl. extremes") {
    GraftExtensions.register(spark)
    val rnd = new Random(7)
    // full tinyint range incl. -128 (quantizeInt8 emits [-127,127];
    // -128 only via hostile input). Uniform dim (unequal lengths are
    // a DOCUMENTED contract divergence: kernel scores the common
    // prefix, the HOF nulls on the zip_with pad) and no all-zero
    // vectors (zero norm: the kernel yields NaN where the HOF's
    // native Divide THROWS under ANSI — see Int8Cosine's Scaladoc;
    // quantized corpora never produce a zero-norm code array)
    val dim = 32
    val arrays = (1 to 200).map { i =>
      val a = Seq.fill(dim)((rnd.nextInt(256) - 128).toByte)
      (i.toLong, if (a.forall(_ == 0)) a.updated(0, 1.toByte) else a)
    } ++ Seq(
      (201L, Seq.tabulate(dim)(j => if (j % 2 == 0) 127.toByte else (-128).toByte)))
    val df = arrays.toDF("id", "codes")
    val pairs = df.select($"id".as("ia"), $"codes".as("ca"))
      .crossJoin(df.select($"codes".as("cb")).limit(9))
    val diff = pairs.select(
      call_function("int8_cosine", $"ca", $"cb").as("fast"),
      graft.operators.Similarity.int8CosineHof($"ca", $"cb").as("ref"))
      // NaN != NaN under =!=, so compare through a null-safe canon:
      .where(not($"fast" <=> $"ref"))
      .count()
    assert(diff == 0)
  }
}
