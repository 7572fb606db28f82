package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash as a typed `Aggregator`: one pass over (id, shingle-hash)
  * rows folds the whole signature at once — the custom-aggregate
  * counterpart of `Dedup.minhashSignatures`'s 16 expression aggregates
  * (SURVEY.md §2.12 reserves `Aggregator` for exactly this surface).
  *
  * The buffer is the running element-wise minimum of
  * (aᵢ·h + bᵢ) mod p — associative and commutative, so partial
  * aggregation (map-side combine) applies as usual.
  */
class MinHashAggregator(numPerm: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val consts = Dedup.permutationConstants(numPerm).toArray
  private val p = Dedup.MinhashPrime

  override def zero: Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < numPerm) {
      val v = (consts(i)._1 * h + consts(i)._2) % p
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
