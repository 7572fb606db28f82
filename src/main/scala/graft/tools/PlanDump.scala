package graft.tools

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

import graft.{Engine, GraftExtensions, SparkEntry}

/** Dump a probe's `.explain("formatted")` output to a file — the
  * optimization-round evidence format (plans/rNN/<probe>_before.txt /
  * _after.txt). The probe is FORCED first (noop-style toRdd
  * materialization) so per-corpus trained-artifact/index caches are
  * built and the captured plan is the steady-state query path, then
  * the plan is re-built fresh and explained.
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <name> [name2 ...]
  * (files are written as <outDir>/<name>.txt)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = Engine.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).queryExecution.toRdd.count() // warm caches/indexes
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val pw = new PrintWriter(new File(outDir, s"$name.txt"))
      try pw.println(txt) finally pw.close()
      println(s"[plandump] wrote ${new File(outDir, s"$name.txt").getPath} " +
        s"(${txt.length} chars)")
    }
    spark.stop()
  }
}
