package graft.operators



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
  private def update(m: java.util.HashMap[String, java.lang.Long], w: String,
                     capacity: Int): Unit = {
    val c = m.get(w)
    if (c ne null) m.put(w, java.lang.Long.valueOf(c.longValue() + 1L))
    else if (m.size < capacity) m.put(w, java.lang.Long.valueOf(1L))
    else {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.longValue() == 1L) it.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue.longValue() - 1L))
      }
    }
  }

  /** Summary state: bounded counter map + exact total token count.
    * MUTATED in place by reduce/merge (the documented `Aggregator`
    * contract) and kryo-encoded, so it is serialized only at the
    * partial→final boundary — never copied per input row. */
  final class MgState(val m: java.util.HashMap[String, java.lang.Long],
                      var total: Long)

  /** Aggregator over raw text rows: tokenizes on whitespace inside
    * `reduce` so no exploded token rows ever materialize. */
  class MisraGries(capacity: Int)
      extends Aggregator[String, MgState, Map[String, Long]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: MgState =
      new MgState(new java.util.HashMap[String, java.lang.Long], 0L)

    override def reduce(b: MgState, text: String): MgState = {
      if (text == null) return b
      for (w <- text.trim.split("\\s+") if w.nonEmpty) {
        update(b.m, w, capacity)
        b.total += 1
      }
      b
    }

    /** Mergeable-summaries combine: sum counters, then reduce back to
      * `capacity` survivors by subtracting the (capacity+1)-th largest
      * combined count from every counter and dropping non-positives. */
    override def merge(a: MgState, b: MgState): MgState = {
      val it = b.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val prev = a.m.get(e.getKey)
        val sum = (if (prev eq null) 0L else prev.longValue()) + e.getValue.longValue()
        a.m.put(e.getKey, java.lang.Long.valueOf(sum))
      }
      if (a.m.size > capacity) {
        val vals = new Array[Long](a.m.size)
        var i = 0
        val vIt = a.m.values().iterator()
        while (vIt.hasNext) { vals(i) = vIt.next().longValue(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
        val eIt = a.m.entrySet().iterator()
        while (eIt.hasNext) {
          val e = eIt.next()
          val v = e.getValue.longValue() - cut
          if (v <= 0L) eIt.remove()
          else e.setValue(java.lang.Long.valueOf(v))
        }
      }
      a.total += b.total
      a
    }

    override def finish(buf: MgState): Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      val it = buf.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); b += e.getKey -> e.getValue.longValue()
      }
      b.result()
    }

    override def bufferEncoder: Encoder[MgState] = Encoders.kryo[MgState]
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
