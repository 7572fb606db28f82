package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min Sketch over a token stream — the POINT-FREQUENCY sketch
  * of the curation toolkit (x17 quantiles, x18 distinct counts, x34
  * heavy-hitter LISTS, this: "how often does THIS token/url/id occur",
  * answerable without ever materializing the billion-row token count).
  *
  * `depth` rows × `width` cells of int64; update adds 1 to one cell
  * per row, merge is element-wise addition (EXACT, so partial
  * aggregation and arbitrary merge trees change nothing), and a point
  * estimate is the MIN over the depth cells — never below the true
  * count, above it only by colliding mass (≤ e/width · N per row in
  * expectation, min over `depth` independent rows).
  *
  * The row hashes are md5-derived (`md5(d || "_" || token)`), NOT JVM
  * hashCode — so a query engine (or the DuckDB oracle, probe x40) can
  * compute the same cell indices relationally and read estimates
  * straight out of the sketch array with `element_at`. State is
  * O(depth·width) per partition regardless of corpus size.
  */
object CountMin {

  private val localMd5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Cell index of `token` in row `d`: first 15 md5 hex digits (60
    * bits, non-negative) of "d_token", mod width. */
  def cellIndex(d: Int, token: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"${d}_"), token)), 1, 15), 16, 10)
      .cast("long") % width

  /** Point estimate read relationally from a sketch array column
    * (layout: row d at [d·width, (d+1)·width)); min over rows.
    * `element_at` is 1-based. */
  def estimate(sketch: Column, token: Column, width: Int, depth: Int): Column =
    (0 until depth)
      .map(d => element_at(sketch, (lit(d * width) + cellIndex(d, token, width))
        .cast("int") + 1))
      .reduce(least(_, _))

  /** Aggregator over raw text rows: whitespace-tokenizes in `reduce`,
    * one flat long array as state (exact element-wise merge). */
  class Sketch(width: Int, depth: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(width > 0 && depth > 0, "width and depth must be positive")

    // Same value as parsing the first 15 md5 hex digits (= the top 60
    // bits of the first 8 digest bytes, non-negative after >>> 4),
    // without the per-call MessageDigest.getInstance + per-byte hex
    // formatting the original paid — that allocation/formatting was
    // ~all of x40's 5.5s wall (1.3M tokens × depth hashes).
    private def indexOf(d: Int, w: String): Int = {
      val md = CountMin.localMd5.get()
      md.reset()
      val digest = md.digest(s"${d}_$w".getBytes("UTF-8"))
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
      ((v >>> 4) % width).toInt
    }

    override def zero: Array[Long] = new Array[Long](width * depth)

    override def reduce(b: Array[Long], text: String): Array[Long] = {
      if (text == null) return b
      for (w <- text.trim.split("\\s+") if w.nonEmpty) {
        var d = 0
        while (d < depth) { b(d * width + indexOf(d, w)) += 1L; d += 1 }
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Untyped entry point: `df.agg(countMin(8192, 4)(col("text")))`. */
  def countMin(width: Int, depth: Int): Column => Column = {
    val fn = udaf(new Sketch(width, depth))
    (c: Column) => fn(c)
  }

  // --- The AT-REST sketch artifact (probe x125) -------------------
  // The point-frequency member of the at-rest family (int8 IVF /
  // IVF-PQ / shingle / bloom / BM25 / HLL): a daily-cadence
  // frequency pipeline pays the raw token scan ONCE per batch and
  // persists the batch's SPARSE nonzero cells as plain
  // (d, cell, n) rows; reading merges them by per-cell SUM.
  //
  // THE CONTRAST WITH THE HLL ARTIFACT, stated loudly: HLL's
  // register merge is MAX — idempotent — so a replayed append is
  // value-harmless there. Count-Min's merge is SUM, which is
  // associative and commutative (any merge tree is exact) but NOT
  // idempotent: a replayed batch DOUBLE-COUNTS. The `doneMarker` on
  // [[appendToSketch]] is therefore load-bearing for correctness,
  // not just for scan-cost hygiene, and CountMinSpec pins exactly
  // that (an unmarked replay shifts estimates; a marked one is a
  // no-op). Layout under `path`:
  //   cells/  (d, cell, n) sparse nonzero cells, one file set per
  //           build/append batch
  //   meta/   (width, depth, value_col) — geometry persisted so an
  //           append can never hash a different column or shape
  //           into the artifact
  // ---------------------------------------------------------------

  /** The sketch of `df` as a sparse relation: one partial-aggregated
    * pass through [[Sketch]] (map-side combined long arrays), then
    * the single final array exploded to nonzero (d, cell, n) rows —
    * ≤ width·depth rows out regardless of corpus size. */
  def cells(df: DataFrame, c: Column, width: Int, depth: Int): DataFrame =
    df.agg(countMin(width, depth)(c).as("cms"))
      .select(posexplode(col("cms")).as(Seq("i", "n")))
      .where(col("n") > 0)
      .select((col("i") / width).cast("int").as("d"),
        (col("i") % width).cast("int").as("cell"), col("n"))

  /** Build the at-rest sketch: one raw scan, persisted sparse. */
  def writeSketch(df: DataFrame, valueCol: String, path: String,
                  width: Int = 8192, depth: Int = 4): Unit = {
    require(width > 0 && depth > 0, "width and depth must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    cells(df, col(valueCol), width, depth)
      .write.mode("overwrite").parquet(s"$path/cells")
    Seq((width, depth, valueCol)).toDF("width", "depth", "value_col")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Geometry off the ARTIFACT, never from a caller (a width/depth
    * mismatch would silently sum incompatible cells). */
  private def sketchMeta(spark: org.apache.spark.sql.SparkSession,
                         path: String): (Int, Int, String) = {
    val r = spark.read.parquet(s"$path/meta")
      .select("width", "depth", "value_col").head()
    (r.getInt(0), r.getInt(1), r.getString(2))
  }

  /** Append a BATCH — O(batch): only the new rows are tokenized and
    * hashed (geometry off the persisted meta), the batch's sparse
    * cells land as additional files, nothing is read back. SUM-merge
    * is NOT idempotent, so the replay marker here GUARDS VALUES:
    * re-landing a batch without it double-counts every token the
    * batch carried. Always pass `doneMarker` from an at-least-once
    * scheduler; the commit itself is the family's crash-atomic staged
    * protocol ([[Compaction.appendWithMarker]]), so a crash mid-commit
    * cannot double-count either. */
  def appendToSketch(batch: DataFrame, path: String,
                     doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (width, depth, valueCol) = sketchMeta(spark, path)
      cells(batch, col(valueCol), width, depth)
        .write.mode("overwrite").parquet(s"$staging/cells")
    }
  }

  /** RETRACT a previously-ingested batch — the "forget this source"
    * operation (a contaminated/poisoned/withdrawn slice must leave
    * the daily stats without a rebuild): SUM-merge is a GROUP, so
    * appending the batch's cells NEGATED is an exact inverse —
    * after retraction every read is bit-identical to an artifact
    * that never ingested the batch (CountMinSpec pins it).
    *
    * The caller's contract, stated loudly: retract EXACTLY what was
    * ingested (same rows, same value column). Retracting a batch
    * never ingested drives cells negative and estimates below truth
    * — the sketch cannot detect it (cells are anonymous sums).
    * `doneMarker` is load-bearing exactly as for appends: a replayed
    * retraction double-subtracts. Use a distinct marker id from the
    * original append (e.g. "rt-<batch>") — reusing the append's id
    * would no-op against its landed marker. */
  def retractFromSketch(batch: DataFrame, path: String,
                        doneMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    Compaction.appendWithMarker(spark, path, doneMarker) { staging =>
      val (width, depth, valueCol) = sketchMeta(spark, path)
      cells(batch, col(valueCol), width, depth)
        .withColumn("n", -col("n"))
        .write.mode("overwrite").parquet(s"$staging/cells")
    }
  }

  /** The merged cells of everything ever written or appended — one
    * SUM over the persisted per-batch rows (≤ batches·width·depth in,
    * ≤ width·depth out; merge trees are exact in int64). */
  def readCells(spark: org.apache.spark.sql.SparkSession,
                path: String): DataFrame =
    spark.read.parquet(s"$path/cells")
      .groupBy("d", "cell").agg(sum("n").as("n"))

  /** Compact after an append schedule: rewrite the MERGED cells (sum
    * is the artifact's value semantics, so the result is
    * read-equivalent while shrinking batches·width·depth rows back
    * to ≤ width·depth). Meta and replay markers live outside cells/
    * and are untouched; see [[Compaction]] for the crash stance. */
  def compactSketch(spark: org.apache.spark.sql.SparkSession,
                    path: String): Unit =
    Compaction.compactValueDir(spark, s"$path/cells")(readCells(spark, path))

  /** Point estimates straight off the artifact for a bounded query
    * relation: per query token, min over the depth rows' cells —
    * never below the true count of everything ingested, above it
    * only by colliding mass. The merged cells (≤ width·depth rows)
    * are BROADCAST, so a billion-row query side stays map-only —
    * the shape a 100 TB lookup pipeline needs. */
  def estimateFromSketch(spark: org.apache.spark.sql.SparkSession,
                         path: String, queries: DataFrame,
                         tokenCol: String): DataFrame = {
    val (width, depth, _) = sketchMeta(spark, path)
    val pairs = queries.select(col(tokenCol).as("w"))
      .select(col("w"), posexplode(array((0 until depth).map { d =>
        struct(lit(d).cast("int").as("d"),
          cellIndex(d, col("w"), width).cast("int").as("cell"))
      }: _*)))
      .select(col("w"), col("col.d").as("d"), col("col.cell").as("cell"))
    pairs.join(broadcast(readCells(spark, path)), Seq("d", "cell"), "left")
      .na.fill(0L, Seq("n"))
      .groupBy("w").agg(min("n").as("estimate"))
  }
}
