package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Engine, GraftExtensions, SparkEntry}

/** Does `df.count()` optimize away the probe's real work (outer-join
  * elimination under no-column-selected)? Print the optimized count
  * plan for suspect probes. */
object CountPlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    for (name <- args.drop(1)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val counted = df.groupBy().count()
      println(s"=== $name optimized count plan:")
      println(counted.queryExecution.optimizedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
