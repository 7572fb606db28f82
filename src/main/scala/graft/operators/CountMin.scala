package graft.operators

import org.apache.spark.sql.{Column, Encoder}
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
}
