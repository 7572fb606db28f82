package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  test("codegen DotProduct equals the HOF formulation bit-for-bit") {
    val embs = Tables.embeddings(spark, sfDir).limit(200)
    val pairs = embs.select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(embs.select($"vec_id".as("ib"), $"embedding".as("vb")).limit(5))
    val diff = pairs.select(
      Similarity.dot($"va", $"vb").as("fast"),
      Similarity.dotHof($"va", $"vb").as("ref"))
      .where($"fast" =!= $"ref")
      .count()
    assert(diff == 0)
  }

  test("DotProduct via SQL and null propagation") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect().head
    assert(r.getDouble(0) == 11.0)
    val n = spark.sql(
      "SELECT graft_dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d").collect().head
    assert(n.isNullAt(0))
  }

  test("DotProduct participates in whole-stage codegen") {
    val embs = Tables.embeddings(spark, sfDir)
    val df = embs.select(Similarity.dot($"embedding", $"embedding").as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined, s"no codegen span:\n$plan")
  }
}
