package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** The shared crash-atomic append protocol behind every at-rest
  * artifact family ([[graft.operators.Compaction.appendWithMarker]]):
  * marked replays are no-ops, a crashed attempt's partially-moved
  * files are swept on retry (the window the old append-then-mark
  * protocol left open for the SUM-merged artifacts), multi-relation
  * batches commit together, and unmarked appends keep the documented
  * no-guard semantics. */
class AppendMarkerSpec extends SparkTestBase {

  import spark.implicits._

  private def newRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_apm_$tag").toString

  private def cellSum(root: String): Long =
    spark.read.parquet(s"$root/cells").agg(sum("n")).head().getLong(0)

  private def writeBatch(staging: String, rows: Seq[(Int, Long)]): Unit =
    rows.toDF("cell", "n").write.mode("overwrite").parquet(s"$staging/cells")

  test("marked append lands once; replay is a no-op") {
    val root = newRoot("replay")
    Seq((0, 10L)).toDF("cell", "n").write.parquet(s"$root/cells")
    Compaction.appendWithMarker(spark, root, Some("b1"))(
      writeBatch(_, Seq((0, 5L))))
    assert(cellSum(root) === 15L)
    Compaction.appendWithMarker(spark, root, Some("b1"))(
      writeBatch(_, Seq((0, 5L))))
    assert(cellSum(root) === 15L, "marked replay must not re-land the batch")
    assert(new java.io.File(s"$root/_append_b1_ok").exists())
  }

  test("crash between move and marker: retry sweeps the partial move " +
      "and lands the batch exactly once") {
    val root = newRoot("crash")
    Seq((0, 10L)).toDF("cell", "n").write.parquet(s"$root/cells")
    // simulate the dead attempt: staging dir still present (it is only
    // removed after the marker lands) and one batch file already moved
    // into place wearing the marker prefix
    Seq((0, 7L)).toDF("cell", "n").write.mode("overwrite")
      .parquet(s"$root/_tmp_halfmoved")
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val moved = fs.listStatus(new Path(s"$root/_tmp_halfmoved"))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    assert(moved.nonEmpty)
    moved.zipWithIndex.foreach { case (s, i) =>
      fs.rename(s.getPath,
        new Path(s"$root/cells", s"ap-b2__part-$i.parquet"))
    }
    fs.mkdirs(new Path(s"$root/_append_b2_staging"))
    assert(cellSum(root) === 17L, "sanity: the half-moved file is visible")
    // the retry must delete the half-moved 7 and land the real batch 5
    Compaction.appendWithMarker(spark, root, Some("b2"))(
      writeBatch(_, Seq((0, 5L))))
    assert(cellSum(root) === 15L,
      "retry must sweep the crashed attempt's files before re-landing")
    assert(new java.io.File(s"$root/_append_b2_ok").exists())
    assert(!new java.io.File(s"$root/_append_b2_staging").exists())
  }

  test("multi-relation batches move together under one marker") {
    val root = newRoot("multi")
    Seq((0, 1L)).toDF("cell", "n").write.parquet(s"$root/cells")
    Seq((100L, 2L)).toDF("k", "v").write.parquet(s"$root/aux")
    Compaction.appendWithMarker(spark, root, Some("m1")) { staging =>
      writeBatch(staging, Seq((1, 3L)))
      Seq((200L, 4L)).toDF("k", "v").write.mode("overwrite")
        .parquet(s"$staging/aux")
    }
    assert(cellSum(root) === 4L)
    assert(spark.read.parquet(s"$root/aux").count() === 2L)
    // every moved file wears the marker prefix (the sweep contract)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val prefixed = fs.listFiles(new Path(root), true)
    var n = 0
    while (prefixed.hasNext) {
      val f = prefixed.next()
      if (f.getPath.getName.startsWith("ap-m1__")) n += 1
    }
    assert(n >= 2, "both relations' files must carry the marker prefix")
  }

  test("unmarked appends have no replay guard (documented failure mode)") {
    val root = newRoot("unmarked")
    Seq((0, 10L)).toDF("cell", "n").write.parquet(s"$root/cells")
    Compaction.appendWithMarker(spark, root, None)(
      writeBatch(_, Seq((0, 5L))))
    Compaction.appendWithMarker(spark, root, None)(
      writeBatch(_, Seq((0, 5L))))
    assert(cellSum(root) === 20L, "unmarked appends land every time")
  }

  test("invalid marker ids are refused") {
    val root = newRoot("badmk")
    intercept[IllegalArgumentException] {
      Compaction.appendWithMarker(spark, root, Some("../escape"))(_ => ())
    }
  }

  test("compaction refuses while a marked append's staging dir exists " +
      "(it would defeat the retry sweep)") {
    val root = newRoot("cprefuse")
    Seq((0, 10L)).toDF("cell", "n").write.parquet(s"$root/cells")
    // a crashed marked append: staging still present, one file already
    // moved into place wearing the marker prefix — exactly the state a
    // compaction rewrite would fold into unprefixed part files
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(s"$root/_append_bx_staging"))
    val flat = intercept[IllegalStateException] {
      Compaction.compactValueDir(spark, s"$root/cells")(
        spark.read.parquet(s"$root/cells"))
    }
    assert(flat.getMessage.contains("_append_bx_staging"))
    val part = intercept[IllegalStateException] {
      Compaction.compactPartitionedDir(spark, s"$root/cells", Seq("cell"))
    }
    assert(part.getMessage.toLowerCase.contains("retry the append"))
    // the retry completes the append; compaction then proceeds and the
    // value survives
    Compaction.appendWithMarker(spark, root, Some("bx"))(
      writeBatch(_, Seq((0, 5L))))
    Compaction.compactValueDir(spark, s"$root/cells")(
      spark.read.parquet(s"$root/cells"))
    assert(cellSum(root) === 15L)
  }

  test("a crashed UNMARKED append's staging dir is swept by the next " +
      "unmarked append and by compaction (no leak)") {
    val root = newRoot("unmklk")
    Seq((0, 10L)).toDF("cell", "n").write.parquet(s"$root/cells")
    // simulate the crash: the deterministic unmarked staging dir left
    // behind with a fully-staged batch that never moved
    Seq((0, 99L)).toDF("cell", "n").write.mode("overwrite")
      .parquet(s"$root/_appendtmp_staging/cells")
    val stale = new java.io.File(s"$root/_appendtmp_staging")
    assert(stale.exists())
    // the next unmarked append sweeps the leftover and lands only its
    // own batch — the crashed batch's staged rows never become visible
    Compaction.appendWithMarker(spark, root, None)(
      writeBatch(_, Seq((0, 5L))))
    assert(!stale.exists(), "stale unmarked staging must be swept")
    assert(cellSum(root) === 15L,
      "only the live unmarked batch lands; the crashed staging is garbage")
    // compaction also sweeps it (the maintenance-pass path for callers
    // that switched to marked appends after the crash)
    Seq((1, 1L)).toDF("cell", "n").write.mode("overwrite")
      .parquet(s"$root/_appendtmp_staging/cells")
    Compaction.compactValueDir(spark, s"$root/cells")(
      spark.read.parquet(s"$root/cells"))
    assert(!stale.exists(), "compaction sweeps stale unmarked staging")
    assert(cellSum(root) === 15L)
  }
}
