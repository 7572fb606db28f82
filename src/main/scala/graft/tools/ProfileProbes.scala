package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Engine, GraftExtensions, SparkEntry}

/** Scratch profiler: run named probes N times each against a SF dir,
  * print per-iteration wall seconds (steady state vs first-run
  * planning/JIT). Usage: runMain graft.tools.ProfileProbes <sfDir> <reps> <name...>
  */
object ProfileProbes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Engine.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // full materialization — df.count() lets the optimizer delete
        // unique-key outer joins (and the probe's work with them)
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
