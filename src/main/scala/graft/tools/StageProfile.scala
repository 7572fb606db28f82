package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import graft.{Engine, GraftExtensions, SparkEntry}

/** Scratch profiler: bench-style warmup, then run one probe `reps`
  * times printing per-job and per-stage wall times — pinpoints where a
  * first-run-vs-steady-state gap lives (scheduler, one stage, or
  * between-jobs driver time).
  * Usage: runMain graft.tools.StageProfile <sfDir> <reps> <name>
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val name = args.lift(2).getOrElse("x14_tfidf_keywords")
    val spark = Engine.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val events = ArrayBuffer[String]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          a <- si.submissionTime; b <- si.completionTime
        } yield b - a
        events.synchronized {
          events += f"    stage ${si.stageId}%3d ${si.name.takeWhile(_ != '(').trim}%-24s tasks=${si.numTasks}%3d wall=${ms.getOrElse(-1L)}%5d ms"
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        events.synchronized { events += f"  job ${e.jobId}%3d end t=${e.time}" }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        events.synchronized { events += f"  job ${e.jobId}%3d start t=${e.time}" }
    }

    // bench-style warmup (Bench.scala) ---------------------------------
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import spark.implicits._
      spark.read.parquet(s"$sfDir/nation.parquet").count()
      val tiny = spark.range(100).select(
        (col("id") % 10).as("k"), col("id").cast("double").as("v"))
      tiny.withColumn("r", row_number().over(Window.partitionBy("k").orderBy("v")))
        .withColumn("x", explode(array(lit(1), lit(2))))
        .join(tiny.groupBy("k").agg(sum("v").as("s")), "k")
        .orderBy("v").count()
      tiny.as[(Long, Double)].groupByKey(_._1)
        .flatMapGroups((_, it) => it.map(_._2)).count()
      tiny.select(explode(split(lit("a b c"), " ")).as("w"), col("k"))
        .groupBy("k", "w").agg(count(lit(1)).as("c"))
        .withColumn("r", row_number().over(Window.partitionBy("k").orderBy(col("c").desc)))
        .where(col("r") <= 2).count()
    }

    spark.sparkContext.addSparkListener(listener)
    // comma-separated names profile several probes in ONE JVM (shared
    // warmup; per-probe steady state is what the reps converge to)
    name.split(",").map(_.trim).filter(_.nonEmpty).foreach { nm =>
      val fn = SparkEntry.queries(nm)
      (1 to reps).foreach { i =>
        events.synchronized { events.clear() }
        val t0 = System.nanoTime()
        // full materialization — df.count() lets the optimizer delete
        // unique-key outer joins (and the probe's work with them)
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)   // let listener events drain
        println(f"[stageprofile] run $i $nm wall=$wall%.2f s")
        events.synchronized { events.foreach(println) }
      }
    }
    spark.stop()
  }
}
