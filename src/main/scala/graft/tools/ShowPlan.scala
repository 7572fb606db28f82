package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Engine, GraftExtensions, SparkEntry}

/** Print a probe's formatted physical plan (post-execution, so AQE's
  * final plan is shown). Usage: runMain graft.tools.ShowPlan <sfDir> <name>
  */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val name = args.lift(1).getOrElse("x14_tfidf_keywords")
    val spark = Engine.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count()
    println("=== formatted (final adaptive plan) ===")
    println(df.queryExecution.executedPlan.toString.take(20000))
    spark.stop()
  }
}
