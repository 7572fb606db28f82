package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation sampling.
  *
  * `stratifiedByDecile`: bucket rows into quality deciles and keep a
  * per-decile fraction — the usual quality-weighted downsampling of
  * web corpora. Deciles are THRESHOLD partitions (exact interpolated
  * percentiles at 0.1…0.9 via [[groupPercentilesExact]], broadcast
  * back as nine comparisons), NOT `ntile` over a global sort: the
  * ntile formulation is `Window.orderBy(score)` with no partition key
  * — ONE task sorts and scans the whole corpus, the exact shape that
  * dies at 100 TB. The keep decision hashes the tie-break id
  * (salted md5, engine-portable) instead of drawing randoms, so the
  * sample is reproducible on any engine and any partitioning.
  */
object Sampling {

  /** Quality-decile stratified sampling. `fractions` maps decile
    * (1 = lowest scores … 10 = highest) to its keep fraction (absent
    * deciles drop). Deciles are threshold partitions: decile d
    * contains rows with score in (t_{d−1}, t_d] where t_k is the
    * exact interpolated k/10-percentile — so TIED scores always share
    * a decile (a deviation from ntile, which splits ties across
    * buckets by sort position to equalize counts; threshold deciles
    * are the reproducible contract). Null/NaN scores are dropped
    * (unscorable). `seed` salts the md5 keep-hash. Output keeps the
    * input columns plus `decile`. */
  def stratifiedByDecile(df: DataFrame, scoreCol: String,
                         fractions: Map[Int, Double], seed: Long = 42,
                         tieBreak: String = "doc_id"): DataFrame = {
    require(fractions.keys.forall(d => d >= 1 && d <= 10),
      s"decile keys must lie in 1..10: ${fractions.keys}")
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must lie in [0,1]: $fractions")
    // the broadcast threshold row is crossJoined onto the INPUT, so
    // its column names must not collide with user columns — prefix
    // them, and fail loudly on the (reserved) names we do add rather
    // than letting Spark throw an ambiguous-column error mid-plan
    val reserved = (0 until 9).map(k => s"_q$k").toSet + "decile"
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with " +
        "stratifiedByDecile's reserved names (_q0.._q8, decile)")
    val s = col(scoreCol).cast("double")
    // single-group exact percentiles: two-phase bucketed design, no
    // O(corpus) sort and no O(group) aggregate buffer
    val qs = groupPercentilesExact(
        df.select(s.as("_s")).withColumn("_one", lit(1)),
        "_s", "_one", (1 to 9).map(_ / 10.0))
      .groupBy("_g")
      .pivot("_pi", 0 until 9).agg(first("_q"))
      .select(col("_g") +: (0 until 9).map(k => col(k.toString).as(s"_q$k")): _*)
    // decile = 1 + #(thresholds strictly below score); ties at a
    // threshold take the LOWER decile (score <= t_d ⇒ decile ≤ d)
    val decile = (0 until 9).foldLeft(lit(1)) { (acc, k) =>
      acc + when(s > col(s"_q$k"), 1).otherwise(0)
    }
    val bucket = conv(substring(
      md5(concat(lit(s"strat${seed}_"), col(tieBreak).cast("string"))),
      1, 7), 16, 10).cast("long") % 1000000L
    val cutoff = (1 to 10).foldLeft(lit(0L)) { (acc, d) =>
      when(decile === d,
        math.round(fractions.getOrElse(d, 0.0) * 1000000.0)).otherwise(acc)
    }
    df.where(s.isNotNull && !isnan(s))
      .crossJoin(broadcast(qs.drop("_g")))
      .withColumn("decile", decile)
      .where(bucket < cutoff)
      .drop((0 until 9).map(k => s"_q$k"): _*)
  }

  /** Exact per-group interpolated percentiles WITHOUT Spark's
    * `percentile` aggregate. The built-in exact `Percentile` is a
    * `TypedImperativeAggregate` whose buffer holds every distinct
    * value of the group — for a continuous score over a 100 TB corpus
    * that is an O(group-size) executor buffer and an OOM on the merge.
    * This is the x64 / [[tokenBudgetSelect]] design instead:
    *
    *  1. one grouped agg finds each group's (n, min, max); scores
    *     quantize into `numBuckets` ascending grid cells (broadcast
    *     join of the group-cardinality stats table);
    *  2. one keyed agg counts rows per (group, cell) — output is
    *     ≤ groups × numBuckets rows, so the running-count window over
    *     it is over a BOUNDED aggregate, never the corpus;
    *  3. each requested fraction `p` needs the values at global ranks
    *     floor(p·(n−1)) and ceil(p·(n−1)); the cumulative cell counts
    *     locate the one cell holding each rank, and the exact
    *     selection (row_number over score) runs only INSIDE those
    *     cells (~1/numBuckets of each group; a value-spiky cell
    *     degrades to a spillable sort, never an aggregate buffer).
    *     Constant groups (min = max) short-circuit to min.
    *
    * Interpolation replicates `Percentile.getPercentile` bit-for-bit
    * — `(higher−pos)·lowerVal + (pos−lower)·higherVal`, returning
    * `lowerVal` when the bracketing values are equal — so results are
    * hash-identical to the built-in aggregate (and to DuckDB's
    * `quantile_cont`). Nulls are ignored, as the built-in does, and
    * NaN scores are likewise excluded (unscorable — the one deviation
    * from the built-in, which sorts NaN above every value); a group
    * with no usable score yields no row.
    *
    * Output: one row per (group, fraction index): `(groupCol, _pi,
    * _q)` with `_pi` the 0-based index into `ps`. */
  def groupPercentilesExact(df: DataFrame, scoreCol: String, groupCol: String,
                            ps: Seq[Double], numBuckets: Int = 4096): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"fractions must lie in [0,1]: $ps")
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    val base = df.select(col(groupCol).as("_g"),
        col(scoreCol).cast("double").as("_s"))
      .where(col("_s").isNotNull && !isnan(col("_s")))
    val stats = base.groupBy("_g").agg(count(lit(1)).as("_n"),
      min("_s").as("_glo"), max("_s").as("_ghi"))
    val psArr = array(ps.map(lit): _*)
    // constant groups: every percentile is the single value
    val degen = stats.where(col("_glo") === col("_ghi"))
      .select(col("_g"), posexplode(psArr).as(Seq("_pi", "_p")))
      .join(stats.select(col("_g"), col("_glo").as("_q")), Seq("_g"))
      .select("_g", "_pi", "_q")
    val varStats = stats.where(col("_glo") =!= col("_ghi"))
    // per-(group, cell) counts — bounded output, so the running-count
    // window below is over an aggregate, not the corpus
    val cell = least(lit(numBuckets - 1),
      floor((col("_s") - col("_glo")) /
        ((col("_ghi") - col("_glo")) / numBuckets)).cast("int"))
    val bucketed = base.join(broadcast(varStats), Seq("_g")).withColumn("_b", cell)
    val wcum = Window.partitionBy("_g").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = bucketed.groupBy("_g", "_b").agg(count(lit(1)).as("_c"))
      .withColumn("_before", coalesce(sum("_c").over(wcum), lit(0L)))
    // ranks needed per group: floor/ceil of p·(n−1) for each p
    val needs = varStats
      .select(col("_g"), col("_n"), posexplode(psArr).as(Seq("_pi", "_p")))
      .withColumn("_pos", col("_p") * (col("_n") - 1).cast("double"))
      .withColumn("_rlo", floor(col("_pos")).cast("long"))
      .withColumn("_rhi", ceil(col("_pos")).cast("long"))
    val ranks = needs.select(col("_g"),
        explode(array(col("_rlo"), col("_rhi"))).as("_r")).distinct()
    // locate each rank's cell via the cumulative counts (tiny ⋈ tiny)
    val located = ranks.join(cum, Seq("_g"))
      .where(col("_r") >= col("_before") && col("_r") < col("_before") + col("_c"))
      .select(col("_g"), col("_r"), col("_b"), (col("_r") - col("_before")).as("_off"))
    // exact selection confined to the located cells
    val slice = bucketed.select("_g", "_b", "_s")
      .join(broadcast(located.select("_g", "_b").distinct()), Seq("_g", "_b"))
    val wrow = Window.partitionBy("_g", "_b").orderBy("_s")
    val rankValues = slice
      .withColumn("_i", row_number().over(wrow).cast("long") - 1)
      .join(broadcast(located), Seq("_g", "_b"))
      .where(col("_i") === col("_off"))
      .select(col("_g"), col("_r"), col("_s").as("_v"))
    val lo = rankValues.select(col("_g"), col("_r").as("_rlo"), col("_v").as("_vlo"))
    val hi = rankValues.select(col("_g"), col("_r").as("_rhi"), col("_v").as("_vhi"))
    val interp = needs.join(broadcast(lo), Seq("_g", "_rlo"))
      .join(broadcast(hi), Seq("_g", "_rhi"))
      .select(col("_g"), col("_pi"),
        when(col("_vlo") === col("_vhi"), col("_vlo"))
          .otherwise(
            (col("_rhi").cast("double") - col("_pos")) * col("_vlo") +
              (col("_pos") - col("_rlo").cast("double")) * col("_vhi"))
          .as("_q"))
    interp.unionByName(degen)
  }

  /** Keep rows whose metric lies inside the per-group quantile band
    * [lo, hi] — the outlier-trimming filter of corpus curation ("drop
    * the shortest 10% and longest 10% per source"). Exact percentiles
    * via [[groupPercentilesExact]] (no O(group-size) aggregate
    * buffer) joined back; at scale the bounds table is
    * group-cardinality-sized and broadcasts. */
  def quantileBandFilter(df: DataFrame, metricCol: String, groupCol: String,
                         lo: Double, hi: Double): DataFrame = {
    val qs = groupPercentilesExact(df, metricCol, groupCol, Seq(lo, hi))
    val bounds = qs.groupBy("_g").agg(
        max(when(col("_pi") === 0, col("_q"))).as("q_lo"),
        max(when(col("_pi") === 1, col("_q"))).as("q_hi"))
      .withColumnRenamed("_g", groupCol)
    df.join(broadcast(bounds), Seq(groupCol))
      .where(col(metricCol) >= col("q_lo") && col(metricCol) <= col("q_hi"))
  }

  /** CCNet-style head/middle/tail bucketing (Wenzek et al. 2020): per
    * group, the top `headFrac` of documents by `scoreCol` are "head",
    * the next `midFrac` "middle", the rest "tail" — CCNet-style
    * quality tiers (scored there by LM perplexity; any score column
    * works, e.g. [[TextOps.lmScore]] where HIGHER mean log-probability
    * = cleaner = head). Null scores land in "tail" (unscorable docs).
    *
    * Thresholds are per-group EXACT interpolated percentiles at
    * fractions `1-headFrac` / `1-headFrac-midFrac` (nulls ignored),
    * computed via [[groupPercentilesExact]] — the two-phase bucketed
    * design, NOT Spark's `percentile` aggregate whose buffer is
    * O(group size) and OOMs on a 100 TB language group. Labels are
    * plain comparisons with ties taking the better bucket — so the
    * partition is reproducible on any engine, unlike a
    * row-number-over-sorted-group formulation, and the corpus-sized
    * path costs one stats broadcast + one bounded keyed count + a
    * cell-confined exact selection, plus a broadcast of the
    * group-cardinality threshold table.
    *
    * Note the default fractions are this framework's choice
    * (head = 10%, middle = 40%, tail = 50%); CCNet itself partitions
    * each language into equal thirds — pass 1.0/3 twice for that. */
  def scoreBuckets(df: DataFrame, scoreCol: String, groupCol: String,
                   headFrac: Double = 0.1, midFrac: Double = 0.4,
                   bucketCol: String = "bucket"): DataFrame =
    labelByThresholds(df,
      scoreBucketThresholds(df, scoreCol, groupCol, headFrac, midFrac),
      scoreCol, groupCol, bucketCol)

  /** The per-group threshold table of [[scoreBuckets]]: `(groupCol,
    * _q_head, _q_mid)` — exact interpolated percentiles at
    * `1-headFrac` / `1-headFrac-midFrac` via
    * [[groupPercentilesExact]]. Group-cardinality-sized; persist it to
    * tier future arrivals against a fixed reference corpus. */
  def scoreBucketThresholds(df: DataFrame, scoreCol: String, groupCol: String,
                            headFrac: Double = 0.1,
                            midFrac: Double = 0.4): DataFrame = {
    require(headFrac > 0 && midFrac >= 0 && headFrac + midFrac < 1,
      s"need 0 < headFrac, 0 <= midFrac, headFrac+midFrac < 1: $headFrac/$midFrac")
    groupPercentilesExact(df, scoreCol, groupCol,
        Seq(1 - headFrac, 1 - headFrac - midFrac))
      .groupBy("_g").agg(
        max(when(col("_pi") === 0, col("_q"))).as("_q_head"),
        max(when(col("_pi") === 1, col("_q"))).as("_q_mid"))
      .withColumnRenamed("_g", groupCol)
  }

  /** The pure-projection labeling stage of [[scoreBuckets]]: apply a
    * precomputed threshold table to rows — one broadcast join plus
    * comparisons, no aggregation — so it runs UNCHANGED on a
    * structured stream (tier new arrivals with thresholds trained on
    * the reference corpus; StreamingSpec pins the batch≡stream
    * equality). Ties take the better bucket; null scores and groups
    * absent from the threshold table land in "tail". */
  def labelByThresholds(df: DataFrame, thresholds: DataFrame,
                        scoreCol: String, groupCol: String,
                        bucketCol: String = "bucket"): DataFrame =
    df.join(broadcast(thresholds), Seq(groupCol), "left")
      .withColumn(bucketCol,
        when(col(scoreCol).isNull, "tail")
          .when(col(scoreCol) >= col("_q_head"), "head")
          .when(col(scoreCol) >= col("_q_mid"), "middle")
          .otherwise("tail"))
      .drop("_q_head", "_q_mid")

  /** Keep ~fraction of rows, decided by an md5 hash of the id —
    * deterministic on any engine/cluster, no RNG. */
  def deterministicSample(df: DataFrame, fraction: Double,
                          idCol: String = "doc_id"): DataFrame = {
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 7), 16, 10)
      .cast("long") % 1000000L
    df.where(bucket < (fraction * 1000000L).toLong)
  }

  /** Deterministic train/val/test split: the id's md5 bucket in
    * [0, 1e6) is mapped onto cumulative weight ranges, so membership
    * is a pure function of the id — stable across runs, engines,
    * cluster sizes and corpus growth (a document never migrates
    * between splits when new data arrives, the property RNG splits
    * lack). Map-only. Weights are normalized; the last range absorbs
    * rounding so every row is labeled. */
  def hashSplit(df: DataFrame, weights: Seq[(String, Double)],
                idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive: $weights")
    val total = weights.map(_._2).sum
    // Salted with "split_" so split membership is independent of
    // `deterministicSample`'s bucketing — an unsalted shared hash would
    // make a 10% sample of a split corpus come entirely from one split.
    val bucket = conv(substring(
      md5(concat(lit("split_"), col(idCol).cast("string"))), 1, 7), 16, 10)
      .cast("long") % 1000000L
    val cum = weights.scanLeft(0.0)(_ + _._2)
      .map(w => math.round(w / total * 1000000L)).toIndexedSeq
    val labeled = weights.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), i)) =>
        val hi = if (i == weights.length - 1) 1000000L else cum(i + 1)
        when(bucket >= cum(i) && bucket < hi, name).otherwise(acc)
    }
    df.withColumn("split", labeled)
  }

  /** Deterministic SOURCE-MIXTURE sampling — the domain-reweighting
    * step of corpus assembly (keep 100% of books, 30% of common-crawl,
    * …): each row keeps iff its salted md5 bucket falls under its
    * source's fraction. Membership is a pure function of (id, source
    * fraction) — stable across runs, engines and corpus growth, like
    * [[hashSplit]], and salted independently of both `hashSplit` and
    * `deterministicSample` so composing the three never correlates.
    * Sources absent from `fractions` default to `defaultFraction`
    * (0 = drop unlisted sources). Map-only, no shuffle. */
  /** Temperature-based mixture sampling (the multilingual/multi-source
    * rebalancing rule of mBERT/XLM-R: sample source i with probability
    * ∝ n_i^alpha, alpha < 1 flattening the head so low-resource
    * sources are not drowned — alpha = 0.3 is the XLM-R setting,
    * alpha = 1 reproduces natural proportions). Where
    * [[deterministicMixture]] takes per-source fractions as GIVEN,
    * this derives them from the corpus itself: per-source quota_i =
    * floor(targetTotal · n_i^alpha / Σ_j n_j^alpha), then keeps the
    * quota_i members with the lowest salted-md5 rank (ties on the id)
    * — fully deterministic, reproducible under any partitioning, no
    * RNG. A source smaller than its quota keeps everything (the
    * leftover budget is NOT redistributed — document the deviation
    * rather than iterate). Output: kept rows + (quota,
    * rank_in_source).
    *
    * Scale shape: the per-source counts are one bounded aggregation
    * (rows = #sources); quotas broadcast back; the per-source top-k
    * is the [[UrlOps.domainQuota]] two-phase window (a LOCAL
    * (source, hash-bucket) window caps any source at
    * preBuckets×quota rows before the global per-source window, so a
    * dominant source never lands on one reducer).
    *
    * Certification note: quota_i passes through pow/floor, so a
    * last-ulp libm divergence could flip a quota only when
    * targetTotal·w_i/W lands within ~1e-13 relative of an integer —
    * the probe pins alpha = 0.5 (sqrt is correctly rounded on every
    * IEEE engine) and the hash compare holds exactly. */
  def temperatureMixture(df: DataFrame, targetTotal: Long,
                         alpha: Double = 0.5,
                         sourceCol: String = "source",
                         idCol: String = "doc_id",
                         salt: String = "tmix_",
                         preBuckets: Int = 64): DataFrame = {
    require(targetTotal > 0, s"targetTotal must be positive: $targetTotal")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must lie in (0,1]: $alpha")
    require(preBuckets > 0, s"preBuckets must be positive: $preBuckets")
    // alpha = 0.5 routes through sqrt, which IEEE 754 requires to be
    // correctly rounded on every engine; pow carries no such
    // guarantee, and the quota floor is the one place a last-ulp
    // divergence could surface as a row-count change
    val wExpr =
      if (alpha == 0.5) sqrt(col("n").cast("double"))
      else pow(col("n").cast("double"), lit(alpha))
    val w = df.groupBy(sourceCol).agg(count(lit(1)).as("n"))
      .withColumn("w", wExpr)
    val tot = w.agg(sum("w").as("tw"))
    // round-6 BEFORE the floor: `tw` is an order-sensitive double sum
    // (parallel aggregation order moves it a few ulps run to run), and
    // when target·w/tw sits exactly ON an integer — e.g. equal-sized
    // sources, where the quotient is exactly target/k — a last-ulp
    // wobble flips floor() by 1 PER SOURCE and the selected row count
    // with it. Rounding to 6 decimals absorbs the wobble on both
    // engines (the oracle mirrors it), and a genuine non-boundary
    // quotient is never 5e-7 from an integer on real data.
    val quotas = w.crossJoin(broadcast(tot))
      .select(col(sourceCol),
        floor(round(lit(targetTotal.toDouble) * col("w") / col("tw"), 6))
          .cast("long").as("quota"))
    val rnd = conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))),
      1, 7), 16, 10).cast("long")
    val order = Seq(rnd.asc, col(idCol).asc)
    val local = Window
      .partitionBy(col(sourceCol), pmod(hash(col(idCol)), lit(preBuckets)))
      .orderBy(order: _*)
    val global = Window.partitionBy(col(sourceCol)).orderBy(order: _*)
    df.join(broadcast(quotas), Seq(sourceCol))
      .withColumn("_lrn", row_number().over(local))
      .where(col("_lrn") <= col("quota"))
      .drop("_lrn")
      .withColumn("rank_in_source", row_number().over(global))
      .where(col("rank_in_source") <= col("quota"))
  }

  def deterministicMixture(df: DataFrame, fractions: Map[String, Double],
                           sourceCol: String = "source",
                           idCol: String = "doc_id",
                           defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must lie in [0,1]: $fractions")
    val bucket = conv(substring(
      md5(concat(lit("mix_"), col(idCol).cast("string"))), 1, 7), 16, 10)
      .cast("long") % 1000000L
    // thresholds rounded driver-side: 0.3 * 1e6 in double is
    // 299999.99999999994, and a row-side cast would truncate it
    def thr(f: Double): Long = math.round(f * 1000000.0)
    val cutoff = fractions.foldLeft(lit(thr(defaultFraction))) {
      case (acc, (src, f)) => when(col(sourceCol) === src, thr(f)).otherwise(acc)
    }
    df.where(bucket < cutoff)
  }

  /** Global token-budget selection: rank documents by `scoreCol`
    * descending (ties to the smallest id) and keep the ranked prefix
    * whose RUNNING token total stays within `budget` — the "fill a
    * 1T-token training budget with the best documents" step of corpus
    * assembly. The contract is the global greedy prefix: a document
    * keeps iff the cumulative `tokenCol` sum of every document ranked
    * at-or-before it is ≤ budget (no skip-and-backfill).
    *
    * The obvious formulation — `SUM(tokens) OVER (ORDER BY score
    * DESC)` — is a GLOBAL window: one task sorts and scans the whole
    * corpus. This implementation never builds that window:
    *
    *  1. one aggregation finds the score range; scores quantize into
    *     `numBuckets` grid cells (monotone: a strictly better score
    *     never lands in a later bucket, equal scores share a bucket —
    *     so bucket order REFINES the global rank order);
    *  2. one keyed aggregation sums tokens per bucket; the driver
    *     scans the ≤ numBuckets partial sums to find the boundary
    *     bucket where the running total crosses the budget (bounded
    *     collect, like the PQ codebook pulls);
    *  3. buckets before the boundary keep wholesale — no per-row
    *     cumsum ever materializes for them; the exact window cumsum
    *     runs only INSIDE the boundary bucket (~1/numBuckets of the
    *     corpus in expectation) against the remaining budget.
    *
    * The result is row-for-row identical to the global-window rule
    * (bucket order refines rank order, and within the boundary bucket
    * the window uses the same (score desc, id) order). Rows with NULL
    * score or NULL token count are excluded from selection — an
    * unscored document cannot be ranked. Token counts must be ≥ 0.
    *
    * Output: (id, score, n_tokens) for the selected documents. */
  def tokenBudgetSelect(docs: DataFrame, budget: Long, scoreCol: String,
                        tokenCol: String, idCol: String = "doc_id",
                        numBuckets: Int = 4096): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    val base = docs.select(col(idCol),
        col(scoreCol).cast("double").as("score"),
        col(tokenCol).cast("long").as("n_tokens"))
      .where(col("score").isNotNull && col("n_tokens").isNotNull)
    val mm = base.agg(min("score"), max("score")).collect()(0)
    if (mm.isNullAt(0)) return base.limit(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val bucket =
      if (hi == lo) lit(0)
      else least(lit(numBuckets - 1),
        floor((lit(hi) - col("score")) / ((hi - lo) / numBuckets)).cast("int"))
    val bucketed = base.withColumn("_b", bucket)
    val perBucket = bucketed.groupBy("_b")
      .agg(sum("n_tokens").as("bt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var running = 0L
    var boundary = -1 // first bucket whose tokens don't all fit
    var prefixBefore = 0L
    perBucket.foreach { case (b, bt) =>
      if (boundary < 0) {
        if (running + bt > budget) { boundary = b; prefixBefore = running }
        else running += bt
      }
    }
    if (boundary < 0) return bucketed.drop("_b") // everything fits
    val keepWhole = bucketed.where(col("_b") < boundary).drop("_b")
    // exact resolution confined to the boundary bucket: the window is
    // keyed on _b (a single value here), ordered by the same global
    // rank order restricted to the bucket
    val w = Window.partitionBy("_b")
      .orderBy(col("score").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = bucketed.where(col("_b") === boundary)
      .withColumn("_cum", sum("n_tokens").over(w))
      .where(col("_cum") <= budget - prefixBefore)
      .drop("_b", "_cum")
    keepWhole.unionByName(boundaryKept)
  }

  /** GPT-style sequence packing: concatenate documents in id order
    * within each shard and cut the token stream every `budget` tokens;
    * a document's `pack_id` is the chunk its first token lands in
    * (`start_offset` is its position in the shard's stream). The
    * window is partitioned by the shard column, so packing scales by
    * sharding — the global-concatenation order the papers describe is
    * recovered per shard, which is how production packers run (one
    * stream per worker/source), never as a single global sort. */
  def packSequences(docs: DataFrame, budget: Long, tokenCol: String,
                    shardCol: String, idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start_offset",
        coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("start_offset") / budget))
  }

  /** Cluster-balanced sampling: cap every embedding-space cluster at
    * `perCell` members — the diversity-preserving downsample of the
    * SemDeDup/D4-style curation recipes (near-identical web boilerplate
    * concentrates in a few clusters; balancing keeps the tail). The
    * clusters are the deterministic IVF coarse cells (md5-init →
    * one Lloyd mean step → round-6 argmin, [[IvfIndex]]), so the
    * whole pipeline is engine-mirrorable; within a cell the keeper set
    * is the lowest `perCell` by salted-md5 rank (content-independent,
    * reproducible under any partitioning), ties on the id.
    *
    * Scale shape: assignment is the partial-aggregable min(struct)
    * argmin (no per-id sort); the per-cell cap is the two-phase
    * top-k of [[UrlOps.domainQuota]] — a LOCAL (cell, hash-bucket)
    * window caps any cell at preBuckets×perCell rows before the global
    * per-cell window, so one mega-cluster (the 100 TB failure mode:
    * billions of boilerplate near-dups in one cell) never lands on a
    * single reducer. Output: the kept rows with `cell` and
    * `rank_in_cell`. */
  def clusterBalancedSample(embs: DataFrame, nlist: Int, perCell: Int,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            salt: String = "cbs_",
                            preBuckets: Int = 64): DataFrame = {
    require(nlist > 0, s"nlist must be positive: $nlist")
    require(perCell > 0, s"perCell must be positive: $perCell")
    require(preBuckets > 0, s"preBuckets must be positive: $preBuckets")
    val cents = IvfIndex.meanCentroids(
      IvfIndex.hashCells(embs, nlist, idCol), "cell0", vecCol)
    val assigned = IvfIndex.assign(embs, cents, idCol, vecCol)
    val rnd = conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))),
      1, 7), 16, 10).cast("long")
    val order = Seq(rnd.asc, col(idCol).asc)
    val local = Window
      .partitionBy(col("cell"), pmod(hash(col(idCol)), lit(preBuckets)))
      .orderBy(order: _*)
    val global = Window.partitionBy(col("cell")).orderBy(order: _*)
    assigned
      .withColumn("_lrn", row_number().over(local))
      .where(col("_lrn") <= perCell)
      .drop("_lrn")
      .withColumn("rank_in_cell", row_number().over(global))
      .where(col("rank_in_cell") <= perCell)
  }
}
