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

  /** RRF fusion scores from the TAGGED UNION of the two rankings —
    * the STREAMING form of [[rrfFuse]]'s fusion stage: rows (qIdCol,
    * idCol, rank, srcCol) where srcCol names the retriever (exactly
    * the two values `aTag`/`bTag`, ≤ 1 row per (query, id, source)),
    * the shape retrieval outputs land in when both retrievers write
    * to one stream. Returns (qIdCol, idCol, rrf) equal BIT-FOR-BIT to
    * [[rrfFuse]]'s pre-selection scores: per-source conditional mins
    * recover rank_a/rank_b, and the sum is the same FIXED two-term
    * coalesce chain (IEEE addition of two terms is commutative, so
    * arrival order cannot matter).
    *
    * Scale/streaming shape: ONE partial-aggregable aggregation over
    * the already-bounded (≤ 2·Q·k row) union — it runs UNCHANGED as a
    * streaming aggregation (StreamingSpec pins stream ≡ batch), with
    * the per-query top-k selection chained after it exactly as the
    * grouped heap's own streaming twin runs it. [[rrfFuse]] ≡
    * [[topKPerGroup]] ∘ this (RankingSpec pins it). */
  def rrfScoresTagged(tagged: DataFrame, rrfK: Int = 60,
                      qIdCol: String = "q_id", idCol: String = "vec_id",
                      srcCol: String = "src", aTag: String = "a",
                      bTag: String = "b"): DataFrame = {
    require(rrfK >= 0, s"rrfK must be >= 0: $rrfK")
    tagged
      .groupBy(col(qIdCol), col(idCol))
      .agg(min(when(col(srcCol) === aTag, col("rank"))).as("_ra"),
        min(when(col(srcCol) === bTag, col("rank"))).as("_rb"))
      .select(col(qIdCol), col(idCol),
        (coalesce(lit(1.0) / (lit(rrfK) + col("_ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("_rb")), lit(0.0))).as("rrf"))
  }

  /** MMR diversity re-rank (Carbonell & Goldstein 1998): greedily
    * select `k` items per query from a bounded candidate pool,
    * trading relevance against redundancy —
    *
    *   pick_r = argmax over remaining of
    *            λ·rel − (1−λ)·max_{s ∈ picked} sim(c, s)
    *
    * (ties to the LOWER id; round 1 has an empty picked set, penalty
    * 0). The diverse-few-shot / dedup-aware-retrieval primitive: a
    * plain top-k returns near-duplicates of the best hit, MMR forces
    * coverage.
    *
    * Inputs: `candidates` (qIdCol, idCol, relCol) — the ALREADY
    * BOUNDED per-query pool (Q·n rows, e.g. a batch ANN join's
    * output); `codes` (idCol, q_codes) int8 codes for the pairwise
    * similarity ([[Similarity.quantizeInt8]] — integer cosine, so
    * every sim is engine-exact and probe x121 mirrors all rounds).
    *
    * Exactness: rel and sim are exact-integer cosines (doubles with
    * no accumulation ambiguity); λ·rel and (1−λ)·pen are single IEEE
    * multiplies, the penalty max is order-free, the argmax is a
    * partial-aggregable (score DESC, id ASC) pick — codegen'd
    * max(struct) for numeric ids, the `top_k_struct` k=1 heap for any
    * other orderable id type — no window, no rounding.
    *
    * BATCH-ONLY: the greedy rounds are a k-step driver loop, each
    * conditioned on the previous picks — inexpressible as a single
    * streaming aggregation (unlike [[rrfFuse]] and
    * [[evalBinaryRetrieval]], whose StreamingSpec twins run the same
    * plan over a stream). Re-rank per micro-batch via foreachBatch.
    * EAGER: the bounded pool and each round's picks are
    * localCheckpoint-materialized at call time (lineage truncation —
    * the lazy unrolled plan re-instantiates the caller's upstream DAG
    * O(2^k) times and AQE replanning over it dominates wall time), so
    * the returned frame reads materialized rounds, recomputed from the
    * inputs on every call.
    *
    * Scale shape: `k` driver-loop rounds (the GBT/WordPiece bounded
    * driver-loop precedent), each a keyed join of the remaining pool
    * against the ≤(r−1) picked rows per query plus one
    * partial-aggregable argmax — every intermediate is ≤ Q·n rows,
    * nothing corpus-sized. Returns (qIdCol, idCol, mmr, round),
    * round 1..k in pick order. */
  def mmrSelect(candidates: DataFrame, codes: DataFrame, k: Int,
                lambda: Double = 0.5,
                qIdCol: String = "q_id", idCol: String = "vec_id",
                relCol: String = "rel"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1]: $lambda")
    graft.GraftExtensions.register(candidates.sparkSession)
    // The pool (a BOUNDED Q·n relation by contract) is re-referenced by
    // every greedy round — 2 references per round plus the round-1
    // argmax — and `picked` references nest recursively, so the lazy
    // k-round plan instantiates the caller's entire upstream DAG
    // O(2^k) times. AQE re-optimizes the full logical plan at every
    // query-stage boundary, so with a composed chain upstream (x123:
    // two ANN index joins + RRF fusion) PLANNING dominates execution
    // (measured: 8.6s of inter-job driver gaps vs 1.9s in jobs; the
    // formatted plan was 3.0 MB). localCheckpoint materializes the
    // bounded pool once and truncates the lineage — every round now
    // reads a leaf relation (still computed from the parquet inputs on
    // every call; nothing persists across runs).
    val pool = candidates
      .select(col(qIdCol), col(idCol), col(relCol).cast("double").as("_rel"))
      .join(codes.select(col(idCol), col("q_codes").as("_c")), Seq(idCol))
      .select(col(qIdCol), col(idCol), col("_rel"), col("_c"))
      .localCheckpoint()
    // per-query argmax by (score DESC, id ASC): numeric ids take the
    // codegen'd max(struct(_mmr, −id)) DeclarativeAggregate (the hot
    // path — k of these run per call); any other orderable id type
    // (strings included) takes the top_k_struct k=1 heap, which
    // tie-breaks identically through InterpretedOrdering. RankingSpec
    // pins both paths pick the same rows.
    val numericId = candidates.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def argmaxPick(scored: DataFrame, round: Int): DataFrame =
      if (numericId)
        scored
          .groupBy(col(qIdCol))
          .agg(max(struct(col("_mmr"), (-col(idCol)).as("_nid"),
            col(idCol).as("_pid"))).as("_b"))
          .select(col(qIdCol), col("_b._pid").as(idCol),
            col("_b._mmr").as("mmr"), lit(round).as("round"))
      else
        scored
          .groupBy(col(qIdCol))
          .agg(call_function("top_k_struct",
            struct(col("_mmr"), col(idCol)), lit(1), lit(true)).as("_tk"))
          .select(col(qIdCol), col("_tk").getItem(0).as("_b"))
          .select(col(qIdCol), col("_b").getField(idCol).as(idCol),
            col("_b._mmr").as("mmr"), lit(round).as("round"))
    // Each round's picked set (≤ Q·r rows) is checkpointed too: round
    // r references picked_{r-1} twice (anti-join + penalty join), so
    // without truncation the plan still grows ~3^k even over a
    // materialized pool. k bounded extra jobs for a constant-size
    // per-round plan.
    var picked = argmaxPick(
      pool.select(col(qIdCol), col(idCol),
        (lit(lambda) * col("_rel") - lit(1.0 - lambda) * lit(0.0))
          .as("_mmr")), 1).localCheckpoint()
    for (r <- 2 to k) {
      val remaining = pool.join(picked.select(col(qIdCol), col(idCol)),
        Seq(qIdCol, idCol), "left_anti")
      val scored = remaining
        .join(picked.select(col(qIdCol), col(idCol).as("_sid"))
          .join(pool.select(col(qIdCol), col(idCol).as("_sid"),
            col("_c").as("_sc")), Seq(qIdCol, "_sid")), Seq(qIdCol))
        .groupBy(col(qIdCol), col(idCol))
        .agg(max(col("_rel")).as("_rel2"),
          max(call_function("int8_cosine", col("_c"), col("_sc")))
            .as("_pen"))
        .select(col(qIdCol), col(idCol),
          (lit(lambda) * col("_rel2") - lit(1.0 - lambda) * col("_pen"))
            .as("_mmr"))
      picked = picked.unionByName(argmaxPick(scored, r)).localCheckpoint()
    }
    picked.select(col(qIdCol), col(idCol), col("mmr"),
      col("round").cast("int").as("round"))
  }

  /** Position-i DCG discount `1 / log2(i + 1)`, exposed so the
    * operator and any mirror share ONE table of literal doubles —
    * `Double.toString` round-trips exactly, so an engine that parses
    * the printed literal gets the identical bits and the eval needs
    * no transcendental call (log2 differs across libm
    * implementations in the last ulp) and no rounding step. */
  def dcgDiscount(i: Int): Double = 1.0 / (math.log(i + 1.0) / math.log(2.0))

  /** Retrieval evaluation against binary relevance — nDCG@k and
    * recall@k per query, the harness that closes the retrieval loop
    * (index → batch ANN join → fusion → THIS). `ranking` carries
    * (qIdCol, idCol, rank); `qrels` carries the RELEVANT (qIdCol,
    * idCol) pairs (e.g. same-label pairs, click data).
    *
    * Exactness: DCG is a FIXED-ORDER chain of k conditional terms
    * over the [[dcgDiscount]] literal table (rel ∈ {0,1}, so the
    * position term either contributes its literal discount or 0.0 —
    * left-to-right addition, bit-identical on any engine); IDCG@k is
    * the same chain gated on `n_rel >= i`; nDCG is one IEEE divide;
    * recall is an exact integer ratio. No ROUND anywhere (probe x119
    * hash-matches raw doubles).
    *
    * Scale shape: the hits join is keyed on (query, id) over the
    * ALREADY-BOUNDED ranking (Q·k rows); per-query relevant counts
    * are one partial-aggregable count over qrels. Queries with zero
    * relevant pairs score null nDCG/recall (nothing to normalize by).
    * A query with relevant pairs but NO ranking rows (the retriever
    * returned nothing) scores ndcg=0/recall=0 — dropping it would
    * silently inflate downstream means (RankingSpec pins it). The
    * scoring core is [[evalBinaryRetrievalStream]] (one streamable
    * aggregation); this operator adds the zero-hit completion a
    * stream cannot express. Returns (qIdCol, n_rel, n_hits, ndcg,
    * recall). */
  def evalBinaryRetrieval(ranking: DataFrame, qrels: DataFrame, k: Int,
                          qIdCol: String = "q_id",
                          idCol: String = "vec_id"): DataFrame = {
    val scored = evalBinaryRetrievalStream(ranking, qrels, k, qIdCol, idCol)
    // batch-only completion: a qrels-only query (the retriever
    // returned NOTHING) must still score 0.0, not vanish — dropping
    // it would silently inflate downstream means. A STREAM cannot
    // emit rows for queries it never saw, which is exactly why this
    // lives here and not in the streamable core. The anti-join keys
    // on the RANKING's query ids (the exact group set the core
    // emits), not on the core itself — re-evaluating the whole
    // scoring subtree to learn its group keys would double the
    // operator's cost.
    val zeroHit = qrels.groupBy(col(qIdCol))
      .agg(count(lit(1)).cast("int").as("n_rel"))
      .join(ranking.where(col("rank") <= k).select(col(qIdCol)),
        Seq(qIdCol), "left_anti")
      .select(col(qIdCol), col("n_rel"),
        lit(0).as("n_hits"), lit(0.0).as("ndcg"), lit(0.0).as("recall"))
    scored.unionByName(zeroHit)
  }

  /** The STREAMABLE core of [[evalBinaryRetrieval]]: scores every
    * query PRESENT in `ranking`. Both qrels joins (the per-(query,
    * id) relevance flags and the per-query relevant counts) attach to
    * the ranking rows BEFORE the one partial-aggregable per-query
    * aggregation, so with a streaming `ranking` and static `qrels`
    * the whole plan is a supported stream-static left join + ONE
    * streaming aggregation — it runs UNCHANGED on a stream
    * (StreamingSpec pins stream ≡ batch). What a stream cannot do is
    * invent rows for queries it never saw: qrels-only (zero-hit)
    * queries are absent here and completed by the batch operator. */
  def evalBinaryRetrievalStream(ranking: DataFrame, qrels: DataFrame, k: Int,
                                qIdCol: String = "q_id",
                                idCol: String = "vec_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val rels = qrels.select(col(qIdCol), col(idCol)).withColumn("_rel", lit(1))
    val relCounts = qrels.groupBy(col(qIdCol))
      .agg(count(lit(1)).as("_nr"))
    val hits = ranking.where(col("rank") <= k)
      .join(rels, Seq(qIdCol, idCol), "left")
      .join(broadcast(relCounts), Seq(qIdCol), "left")
      .select(col(qIdCol), col("rank"),
        coalesce(col("_rel"), lit(0)).as("rel"), col("_nr"))
    val dcg = (1 to k).map { i =>
      coalesce(max(when(col("rank") === i && col("rel") === 1,
        lit(dcgDiscount(i)))), lit(0.0))
    }.reduceLeft(_ + _)
    // _nr is constant per query (an attached per-query count; null
    // when the query has no qrels rows), so max() just recovers it
    val perQ = hits.groupBy(col(qIdCol))
      .agg(dcg.as("dcg"), sum(col("rel")).cast("int").as("n_hits"),
        max(col("_nr")).as("_nr"))
    val idcg = (1 to k).map { i =>
      when(col("_nr") >= i, lit(dcgDiscount(i))).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    perQ.select(col(qIdCol),
      coalesce(col("_nr"), lit(0L)).cast("int").as("n_rel"),
      col("n_hits"),
      when(col("_nr") > 0, col("dcg") / idcg).as("ndcg"),
      when(col("_nr") > 0,
        col("n_hits").cast("double") / col("_nr").cast("double"))
        .as("recall"))
  }
}
