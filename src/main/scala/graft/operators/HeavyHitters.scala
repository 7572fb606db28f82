package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Heavy hitters over a token stream — the FREQUENCY sketch of the
  * curation toolkit (quantiles: x17, distinct counts: x18, this:
  * "which tokens/domains/urls dominate the corpus").
  *
  * Misra-Gries summary with `capacity` counters as a typed
  * `Aggregator`: per-partition memory is O(capacity) regardless of the
  * distinct-token count, and the merge is the Agarwal et al.
  * "Mergeable Summaries" (PODS'12) combine — add counters, then
  * subtract the (capacity+1)-th largest value and drop non-positives —
  * which PRESERVES the error bound under arbitrary merge trees. That
  * is the whole 100 TB story: an exact token count over a web corpus
  * shuffles billions of distinct tokens; this computes a bounded-size
  * summary with map-side partial aggregation and a single tiny merge,
  * no token shuffle at all.
  *
  * Guarantee (certified by probe x34 + HeavyHittersSpec): every token
  * with true count > N/(capacity+1) of N total tokens is present in
  * the summary, and each reported count under-counts the truth by at
  * most N/(capacity+1). Contents BELOW the threshold are
  * partitioning-dependent — callers must only rely on the guaranteed
  * slice (the probe does).
  */
object HeavyHitters {

  /** MG update of a running summary with one token. O(1) amortized:
    * the decrement-all branch pays O(capacity) but can fire at most
    * once per `capacity` insertions. */
  private def update(m: mutable.HashMap[String, Long], w: String,
                     capacity: Int): Unit = {
    m.get(w) match {
      case Some(c) => m.update(w, c + 1)
      case None if m.size < capacity => m.update(w, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        for ((k, c) <- m) { if (c == 1L) dead += k else m.update(k, c - 1) }
        dead.foreach(m.remove)
    }
  }

  /** Summary state: bounded counter map + exact total token count. */
  case class MgBuf(counters: Map[String, Long], total: Long)

  /** Aggregator over raw text rows: tokenizes on whitespace inside
    * `reduce` so no exploded token rows ever materialize. */
  class MisraGries(capacity: Int)
      extends Aggregator[String, MgBuf, Map[String, Long]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: MgBuf = MgBuf(Map.empty, 0L)

    override def reduce(b: MgBuf, text: String): MgBuf = {
      if (text == null) return b
      val m = mutable.HashMap.from(b.counters)
      var n = b.total
      for (w <- text.trim.split("\\s+") if w.nonEmpty) {
        update(m, w, capacity)
        n += 1
      }
      MgBuf(m.toMap, n)
    }

    /** Mergeable-summaries combine: sum counters, then reduce back to
      * `capacity` survivors by subtracting the (capacity+1)-th largest
      * combined count from every counter and dropping non-positives. */
    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val m = mutable.HashMap.from(a.counters)
      for ((k, c) <- b.counters) m.update(k, m.getOrElse(k, 0L) + c)
      if (m.size > capacity) {
        val cut = m.values.toArray.sorted(Ordering[Long].reverse)(capacity)
        val kept = m.iterator
          .map { case (k, c) => k -> (c - cut) }
          .filter(_._2 > 0L)
        MgBuf(Map.from(kept), a.total + b.total)
      } else MgBuf(m.toMap, a.total + b.total)
    }

    override def finish(buf: MgBuf): Map[String, Long] = buf.counters

    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Untyped entry point: `df.agg(heavyHitters(256)(col("text")))` →
    * one map<string,bigint> of surviving counters. */
  def heavyHitters(capacity: Int): Column => Column = {
    val fn = udaf(new MisraGries(capacity))
    (c: Column) => fn(c)
  }
}
