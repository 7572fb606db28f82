package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Engine, GraftExtensions, SparkEntry}

/** Print every probe's formatted-plan SIZE (chars) — a scan for
  * plan-blowup (subtrees re-referenced without materialization make
  * AQE replanning, not execution, the wall-time driver; x123 measured
  * 3.0 MB before its fix). Usage: runMain graft.tools.PlanSizes <sfDir>
  *
  * Caveat: probes whose builders materialize eagerly (localCheckpoint
  * / artifact writes — x72, mmrSelect callers, MixturePlan callers)
  * run real Spark jobs during DataFrame CONSTRUCTION, so this scan is
  * not cheap for them and their printed sizes are the
  * post-materialization leaf plans (small by construction — which is
  * the point of those fixes, but don't read their rows as "no work
  * upstream").
  */
object PlanSizes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(s"[plansize] $name ${txt.length}")
      } catch {
        // NonFatal only: an OOM/fatal error must kill the scan, not
        // degrade to a one-line ERROR row
        case scala.util.control.NonFatal(e) =>
          println(s"[plansize] $name ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
