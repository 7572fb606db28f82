package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic ranking surfaces over the `top_k_struct` bounded-heap
  * aggregate ([[graft.expressions.TopKStruct]]): grouped top-k
  * selection and reciprocal-rank fusion of retriever rankings.
  *
  * Both are everyday curation/retrieval shapes the reference pipeline
  * has no equivalent for (§2.15 surface): "best k examples per
  * class/language/source" feeds balanced fine-tuning mixes, and RRF
  * (Cormack et al. 2009) is the standard way to combine a lexical
  * retriever with a dense one — or two ANN indexes — without score
  * calibration, because it only consumes RANKS.
  */
object Ranking {

  /** Top-k rows per group by (`scoreCol` DESC when `desc`, else ASC;
    * ties to the LOWER `idCol`) — the window-rank rule, computed as
    * the partial-aggregable `top_k_struct` heap: ObjectHashAggregate
    * keeps ≤k rows per group map-side inside the scan stage, so the
    * one shuffle carries ≤ groups·k rows per partition and the corpus
    * never crosses the wire. At 100 TB this is the grouped-selection
    * form that survives; a `row_number` window shuffles and sorts
    * every corpus row. Returns (groupCol, idCol, scoreCol, rank) with
    * rank 1..k per group. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   idCol: String, k: Int, desc: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    graft.GraftExtensions.register(df.sparkSession)
    df.groupBy(col(groupCol))
      .agg(call_function("top_k_struct",
        struct(col(scoreCol), col(idCol)), lit(k), lit(desc)).as("_tk"))
      .select(col(groupCol), posexplode(col("_tk")).as(Seq("_p", "_r")))
      .select(col(groupCol),
        col("_r").getField(idCol).as(idCol),
        col("_r").getField(scoreCol).as(scoreCol),
        (col("_p") + 1).cast("int").as("rank"))
  }

  /** Reciprocal-rank fusion of two per-query rankings (each carrying
    * (qIdCol, idCol, rank)): `rrf = 1/(rrfK + rank_a) + 1/(rrfK +
    * rank_b)`, a candidate absent from one ranking contributing 0
    * from that side, re-ranked to the fused top-k per query by
    * (rrf DESC, id ASC).
    *
    * Exactness: the two addends are single IEEE divisions and the sum
    * has a FIXED two-term evaluation order (full-outer join +
    * coalesce — never a SUM aggregate whose accumulation order could
    * differ across engines), so the fused scores are bit-identical on
    * any engine (probe x118 mirrors the fusion over the two at-rest
    * ANN chains engine-for-engine).
    *
    * Scale shape: both inputs are already bounded (Q·k rows each —
    * the output of [[Similarity.annJoinInt8FromIndex]] /
    * [[PqIndex.annJoinFromIndex]] or any retriever), the join is
    * keyed on (query, id), and the fused top-k is the same
    * `top_k_struct` bounded heap. Nothing here ever sees the corpus.
    * Returns (qIdCol, idCol, rrf, rank) with rank 1..k per query. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, rrfK: Int = 60,
              qIdCol: String = "q_id", idCol: String = "vec_id"): DataFrame = {
    require(k >= 1 && rrfK >= 0, s"need k>=1, rrfK>=0: k=$k rrfK=$rrfK")
    graft.GraftExtensions.register(a.sparkSession)
    val la = a.select(col(qIdCol), col(idCol), col("rank").as("_ra"))
    val lb = b.select(col(qIdCol), col(idCol), col("rank").as("_rb"))
    val fused = la.join(lb, Seq(qIdCol, idCol), "full_outer")
      .select(col(qIdCol), col(idCol),
        (coalesce(lit(1.0) / (lit(rrfK) + col("_ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("_rb")), lit(0.0))).as("rrf"))
    fused.groupBy(col(qIdCol))
      .agg(call_function("top_k_struct",
        struct(col("rrf"), col(idCol)), lit(k), lit(true)).as("_tk"))
      .select(col(qIdCol), posexplode(col("_tk")).as(Seq("_p", "_r")))
      .select(col(qIdCol),
        col("_r").getField(idCol).as(idCol),
        col("_r.rrf").as("rrf"),
        (col("_p") + 1).cast("int").as("rank"))
  }
}
