package graft.impact

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** X9 TRAIN-HERE, from scratch: the Python reference retrains an
  * XGBoost regressor on every forecast run
  * (forecast_process.py:491-517 — `xgb.XGBRegressor(base_score=0.5,
  * subsample=0.8, gamma=1, max_depth=8, min_child_weight=1,
  * n_estimators=100, learning_rate=0.025, tree_method="hist",
  * grow_policy="depthwise", objective="reg:squarederror",
  * early_stopping_rounds=10)`). XGBoost4J is not on this classpath, so
  * this is a ground-up re-implementation of the `hist` algorithm with
  * xgboost's exact split mathematics, shaped for Spark:
  *
  *  - **objective reg:squarederror**: per-row gradient g = pred − y,
  *    hessian h = 1.
  *  - **histogram split finding**: features are quantized once into at
  *    most `maxBin` bins; per tree level, ONE distributed aggregation
  *    computes (Σg, Σh) per (node, feature, bin) — partial aggregation
  *    makes the shuffle O(nodes × features × bins), independent of row
  *    count, which is what makes depth-8 × 100-round training viable at
  *    100 TB (the same design as xgboost's own AllReduce histograms).
  *  - **gain** (xgboost param.h CalcSplitGain, λ = reg_lambda = 1):
  *    ½·[G_L²/(H_L+λ) + G_R²/(H_R+λ) − G²/(H+λ)] − γ, split accepted
  *    iff gain > 0 and both children satisfy min_child_weight.
  *  - **missing values** are histogrammed separately per feature and the
  *    default direction is learned by trying both assignments, exactly
  *    xgboost's two-direction enumeration.
  *  - **leaf weight** −G/(H+λ) scaled by eta; leaves store the scaled
  *    value, matching the serialized-model convention [[XgbBooster]]
  *    reads back, so trained models flow through the identical
  *    float32-compare / double-accumulate scoring path that x24
  *    oracle-certifies against the reference's own artifact.
  *  - **early stopping** mirrors the reference's fit call: metric MAE on
  *    the LAST eval set, stop after `earlyStoppingRounds` rounds without
  *    improvement, truncate to the best iteration.
  *
  * Documented deviations from native xgboost (both immaterial to the
  * reference's use and both deterministic, which native xgboost's
  * PRNG-driven row sampling is not across thread counts):
  *  - bin cuts come from exact distinct values when a feature has at
  *    most `maxBin` distinct values (same as xgboost), else from evenly
  *    spaced ranks of a deterministic hash-sample rather than the
  *    weighted quantile sketch;
  *  - `subsample` < 1 selects rows by a 64-bit hash of (row fingerprint,
  *    round) rather than xgboost's Mersenne-Twister Bernoulli draw.
  *
  * Note the reference passes both `eta=0.05` and `learning_rate=0.025`;
  * the aliases resolve last-one-wins in xgboost's param handling, so the
  * effective shrinkage is 0.025 — [[GbtParams]] defaults follow suit.
  */
final case class GbtParams(
    numRound: Int = 100,
    maxDepth: Int = 8,
    eta: Double = 0.025,
    lambda: Double = 1.0,
    gamma: Double = 1.0,
    minChildWeight: Double = 1.0,
    subsample: Double = 0.8,
    baseScore: Float = 0.5f,
    maxBin: Int = 256,
    seed: Long = 42L,
    earlyStoppingRounds: Int = 0,
    /** rows hash-sampled for quantile cuts when a feature exceeds maxBin
      * distinct values; bounded driver memory at any input scale. */
    sketchRows: Int = 65536,
    /** "reg:squarederror" (g = pred−y, h = 1) or "binary:logistic"
      * (g = σ(margin)−y, h = σ(1−σ)) — the two objectives the reference
      * trains (xgb_model_v1.R:230,267). For logistic, `baseScore` is a
      * probability and the booster's raw output is a MARGIN — apply
      * [[GbtTrainer.sigmoid]] for probabilities, exactly like
      * xgboost's prob→margin base_score handling. */
    objective: String = "reg:squarederror") {
  require(objective == "reg:squarederror" || objective == "binary:logistic",
    s"unsupported objective $objective")
  /** Initial raw prediction: the margin-scale base score. */
  def baseMargin: Double =
    if (objective == "binary:logistic") {
      val b = baseScore.toDouble
      require(b > 0.0 && b < 1.0, "binary:logistic needs baseScore in (0,1)")
      math.log(b / (1.0 - b))
    } else baseScore.toDouble
}

object GbtTrainer {

  /** A growing tree node; `leftBins(f) ≤ splitBin` routes left. */
  private final case class Node(
      feat: Int, splitBin: Int, cond: Float, defaultLeft: Boolean,
      var left: Int, var right: Int, var leaf: Double, var isLeaf: Boolean)

  private def leafNode(w: Double): Node =
    Node(-1, -1, 0f, defaultLeft = false, -1, -1, w, isLeaf = true)

  /** One training row after quantization: bin index per feature
    * (−1 = missing), label, running prediction, and a deterministic
    * fingerprint driving per-round subsampling. Not `private`: the
    * generated encoder deserializer lives outside this object and needs
    * constructor access. */
  final case class Binned(
      bins: Array[Int], label: Double, pred: Double, fp: Long)

  // ---------------------------------------------------------------- cuts

  /** Per-feature ascending cut values (float32 like xgboost's
    * HistogramCuts): bin(v) = #{cuts ≤ float32(v)}, so the candidate
    * split "bins ≤ b left" is exactly "v < cuts(b)" — the comparison
    * [[XgbBooster.predict]] replays at scoring time. */
  def computeCuts(df: DataFrame, features: Seq[String], params: GbtParams): Array[Array[Float]] = {
    val spark = df.sparkSession
    import spark.implicits._
    features.map { f =>
      // cheap order-independent cardinality probe so a near-continuous
      // feature never pulls an unbounded distinct() onto the driver
      val approx = df.agg(approx_count_distinct(col(f)).as("c")).head().getLong(0)
      if (approx <= params.maxBin * 2L) {
        val distinct = df.select(col(f).cast("double")).na.drop()
          .distinct().as[Double].collect().map(_.toFloat).distinct.sorted
        if (distinct.length <= params.maxBin) distinct.drop(1)
        else quantileCuts(df, f, params)
      } else quantileCuts(df, f, params)
    }.toArray
  }

  /** Evenly spaced ranks of a deterministic hash-sample (deviation note
    * in the object Scaladoc; xgboost uses a weighted sketch here). */
  private def quantileCuts(df: DataFrame, f: String, params: GbtParams): Array[Float] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sampled = df.select(col(f).cast("double").as("v"))
      .na.drop()
      .withColumn("h", abs(xxhash64(col("v"), lit(params.seed))))
      .orderBy("h").limit(params.sketchRows)
      .select("v").as[Double].collect().map(_.toFloat).distinct.sorted
    if (sampled.length <= 1) return Array.empty
    val n = math.min(params.maxBin - 1, sampled.length - 1)
    (1 to n).map(i => sampled((i.toLong * (sampled.length - 1) / n).toInt)).distinct.toArray
  }

  private def binOf(v: Double, cuts: Array[Float]): Int = {
    if (java.lang.Double.isNaN(v)) return -1
    val vf = v.toFloat
    // upper_bound: number of cuts ≤ vf
    var lo = 0; var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= vf) lo = mid + 1 else hi = mid
    }
    lo
  }

  // ------------------------------------------------------------- driver

  /** Walk the partial tree with bin indices; returns the node id the row
    * currently sits in, or −1 once it reaches a finished leaf. */
  private def nodeOf(nodes: java.util.ArrayList[Node], bins: Array[Int]): Int = {
    var n = 0
    while (!nodes.get(n).isLeaf && nodes.get(n).left != -1) {
      val nd = nodes.get(n)
      val b = bins(nd.feat)
      n = if (b == -1) { if (nd.defaultLeft) nd.left else nd.right }
          else if (b <= nd.splitBin) nd.left else nd.right
    }
    if (nodes.get(n).isLeaf) -1 else n
  }

  private final case class Best(
      gain: Double, feat: Int, bin: Int, defaultLeft: Boolean,
      gl: Double, hl: Double, gr: Double, hr: Double)

  /** xgboost's two-direction split enumeration over one node's
    * histograms. `g`/`h` are laid out [feat][bin+1] with slot 0 = the
    * missing bin. Tie-break is deterministic: higher gain, then lower
    * feature, then lower bin, then missing→right. */
  private def bestSplit(g: Array[Array[Double]], h: Array[Array[Double]],
                        cuts: Array[Array[Float]], p: GbtParams): Option[Best] = {
    val gTot = g(0).sum
    val hTot = h(0).sum
    val parent = gTot * gTot / (hTot + p.lambda)
    var best: Best = null
    var f = 0
    while (f < g.length) {
      val gm = g(f)(0); val hm = h(f)(0)
      var gl = 0.0; var hl = 0.0
      var b = 0
      while (b < cuts(f).length) {
        gl += g(f)(b + 1); hl += h(f)(b + 1)
        // missing → right
        var cl = gl; var chl = hl
        var cr = gTot - gl; var chr = hTot - hl
        if (chl >= p.minChildWeight && chr >= p.minChildWeight) {
          val gain = 0.5 * (cl * cl / (chl + p.lambda) + cr * cr / (chr + p.lambda) - parent) - p.gamma
          if (gain > 0 && (best == null || gain > best.gain))
            best = Best(gain, f, b, defaultLeft = false, cl, chl, cr, chr)
        }
        // missing → left
        cl = gl + gm; chl = hl + hm
        cr = gTot - gl - gm; chr = hTot - hl - hm
        if (chl >= p.minChildWeight && chr >= p.minChildWeight) {
          val gain = 0.5 * (cl * cl / (chl + p.lambda) + cr * cr / (chr + p.lambda) - parent) - p.gamma
          if (gain > 0 && (best == null || gain > best.gain))
            best = Best(gain, f, b, defaultLeft = true, cl, chl, cr, chr)
        }
        b += 1
      }
      f += 1
    }
    Option(best)
  }

  private def leafWeight(gSum: Double, hSum: Double, p: GbtParams): Double =
    -gSum / (hSum + p.lambda) * p.eta

  // ------------------------------------------------------------ training

  /** Train on `df` (feature columns castable to double, NaN/null =
    * missing; label non-null double). Returns a booster scoreable by
    * [[XgbBooster.predict]] / the `xgb_score` codegen expression. */
  def train(df: DataFrame, labelCol: String, features: Seq[String],
            params: GbtParams = GbtParams(),
            evalDf: Option[DataFrame] = None): XgbBooster = {
    val spark = df.sparkSession
    val cuts = computeCuts(df, features, params)
    val trainRows = binRows(df, labelCol, features, cuts, params)
    val evalRows = evalDf.map(e => binRows(e, labelCol, features, cuts, params))
    try trainBinned(spark, trainRows, evalRows, cuts, features, params)
    finally {
      trainRows.unpersist(blocking = false)
      evalRows.foreach(_.unpersist(blocking = false))
    }
  }

  private def binRows(df: DataFrame, labelCol: String, features: Seq[String],
                      cuts: Array[Array[Float]], params: GbtParams): Dataset[Binned] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = params.baseMargin
    val bcCuts = spark.sparkContext.broadcast(cuts)
    val nf = features.length
    val ds = df
      .select(col(labelCol).cast("double").as("y") +:
        features.zipWithIndex.map { case (f, i) => col(f).cast("double").as(s"f$i") }: _*)
      .map { row =>
        val bins = new Array[Int](nf)
        var fp = 0xcbf29ce484222325L // FNV-1a over the quantized row
        var i = 0
        while (i < nf) {
          val v = if (row.isNullAt(i + 1)) Double.NaN else row.getDouble(i + 1)
          bins(i) = binOf(v, bcCuts.value(i))
          fp = (fp ^ bins(i)) * 0x100000001b3L
          i += 1
        }
        val y = row.getDouble(0)
        fp = (fp ^ java.lang.Double.doubleToLongBits(y)) * 0x100000001b3L
        Binned(bins, y, base, fp)
      }
    ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    ds
  }

  /** Mix a row fingerprint with the round number → [0,1) uniform; the
    * deterministic stand-in for xgboost's Bernoulli row sampling. */
  private def sampleKeep(fp: Long, round: Int, p: GbtParams): Boolean = {
    if (p.subsample >= 1.0) return true
    var x = fp ^ (p.seed + 0x9e3779b97f4a7c15L * (round + 1))
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    x ^= x >>> 31
    ((x >>> 11).toDouble / (1L << 53).toDouble) < p.subsample
  }

  private def trainBinned(spark: SparkSession, rows0: Dataset[Binned],
                          eval0: Option[Dataset[Binned]],
                          cuts: Array[Array[Float]], features: Seq[String],
                          p: GbtParams): XgbBooster = {
    import spark.implicits._
    val logistic = p.objective == "binary:logistic"
    val nf = features.length
    val nBins = cuts.map(_.length + 2) // [missing][bin 0..len]
    val slotOf = new Array[Int](nf + 1) // prefix offsets into the flat histogram
    var i = 0
    while (i < nf) { slotOf(i + 1) = slotOf(i) + nBins(i); i += 1 }
    val slots = slotOf(nf)

    var rows = rows0
    var evalRows = eval0
    val trees = scala.collection.mutable.ArrayBuffer.empty[java.util.ArrayList[Node]]
    var bestMae = Double.MaxValue
    var bestRound = -1
    var round = 0
    var stop = false

    while (round < p.numRound && !stop) {
      val nodes = new java.util.ArrayList[Node]()
      nodes.add(Node(-1, -1, 0f, defaultLeft = false, -1, -1, 0.0, isLeaf = false))
      var frontier: Seq[Int] = Seq(0)

      var depth = 0
      while (depth <= p.maxDepth && frontier.nonEmpty) {
        val bcNodes = spark.sparkContext.broadcast(nodes)
        val frontierIdx = frontier.zipWithIndex.toMap
        val bcFrontier = spark.sparkContext.broadcast(frontierIdx)
        val roundNow = round
        val atMaxDepth = depth == p.maxDepth

        // ONE pass: per-partition dense histograms over the frontier,
        // emitted sparse, then a bounded groupBy — the map-side combine
        // keeps the shuffle at O(frontier × Σbins) regardless of rows.
        val hist = rows.mapPartitions { it =>
          val fIdx = bcFrontier.value
          val nd = bcNodes.value
          val g = new Array[Double](fIdx.size * slots)
          val h = new Array[Double](fIdx.size * slots)
          it.foreach { r =>
            if (sampleKeep(r.fp, roundNow, p)) {
              val node = nodeOf(nd, r.bins)
              if (node >= 0) fIdx.get(node).foreach { fi =>
                val (grad, hess) =
                  if (logistic) {
                    val pr = 1.0 / (1.0 + math.exp(-r.pred))
                    (pr - r.label, pr * (1.0 - pr))
                  } else (r.pred - r.label, 1.0)
                var f = 0
                while (f < nf) {
                  val slot = fi * slots + slotOf(f) + (r.bins(f) + 1)
                  g(slot) += grad; h(slot) += hess
                  f += 1
                }
              }
            }
          }
          g.indices.iterator.filter(h(_) > 0).map(s => (s, g(s), h(s)))
        }.toDF("slot", "g", "h")
          .groupBy("slot").agg(sum("g").as("g"), sum("h").as("h"))
          .as[(Int, Double, Double)].collect()

        // unpersist (not destroy): a lost cached partition may replay
        // this stage's lineage and re-fetch the broadcast
        bcNodes.unpersist(); bcFrontier.unpersist()

        // reassemble per-node [feat][bin] matrices
        val byNode = Array.fill(frontier.size)(
          (Array.tabulate(nf)(f => new Array[Double](nBins(f))),
           Array.tabulate(nf)(f => new Array[Double](nBins(f)))))
        hist.foreach { case (slot, gv, hv) =>
          val fi = slot / slots
          val rest = slot % slots
          val f = {
            var lo = 0; var hi = nf - 1
            while (lo < hi) { val mid = (lo + hi + 1) >>> 1; if (slotOf(mid) <= rest) lo = mid else hi = mid - 1 }
            lo
          }
          byNode(fi)._1(f)(rest - slotOf(f)) += gv
          byNode(fi)._2(f)(rest - slotOf(f)) += hv
        }

        val next = scala.collection.mutable.ArrayBuffer.empty[Int]
        frontier.zipWithIndex.foreach { case (nodeId, fi) =>
          val (g, h) = byNode(fi)
          val gTot = g(0).sum; val hTot = h(0).sum
          val split = if (atMaxDepth || hTot == 0.0) None else bestSplit(g, h, cuts, p)
          split match {
            case Some(b) =>
              val l = nodes.size()
              nodes.add(Node(-1, -1, 0f, defaultLeft = false, -1, -1, leafWeight(b.gl, b.hl, p), isLeaf = false))
              val r = nodes.size()
              nodes.add(Node(-1, -1, 0f, defaultLeft = false, -1, -1, leafWeight(b.gr, b.hr, p), isLeaf = false))
              nodes.set(nodeId, Node(b.feat, b.bin, cuts(b.feat)(b.bin), b.defaultLeft, l, r, 0.0, isLeaf = false))
              next += l; next += r
            case None =>
              val nd = nodes.get(nodeId)
              // a node that received no rows this round inherits weight 0
              val w = if (hTot == 0.0) nd.leaf else leafWeight(gTot, hTot, p)
              nodes.set(nodeId, leafNode(w))
          }
        }
        frontier = next.toSeq
        depth += 1
      }

      trees += nodes

      // fold the new tree into running predictions
      rows = updatePreds(spark, rows, nodes, round)
      evalRows = evalRows.map(e => updatePreds(spark, e, nodes, round))

      evalRows match {
        case Some(e) if p.earlyStoppingRounds > 0 =>
          // squared error: MAE on raw predictions. logistic: logloss on
          // probabilities (xgboost's default metric), eps-clamped.
          val metric =
            if (logistic) {
              val pr = greatest(least(
                lit(1.0) / (lit(1.0) + exp(-$"pred")), lit(1.0 - 1e-16)),
                lit(1e-16))
              e.agg(avg(-($"label" * log(pr) +
                (lit(1.0) - $"label") * log(lit(1.0) - pr)))).as[Double].head()
            } else e.agg(avg(abs($"pred" - $"label"))).as[Double].head()
          if (metric < bestMae) { bestMae = metric; bestRound = round }
          else if (round - bestRound >= p.earlyStoppingRounds) stop = true
        case _ => bestRound = round
      }
      round += 1
    }

    rows.unpersist(blocking = false)
    evalRows.foreach(_.unpersist(blocking = false))
    toBooster(trees.take(bestRound + 1).toSeq, features, p)
  }

  private def updatePreds(spark: SparkSession, rows: Dataset[Binned],
                          nodes: java.util.ArrayList[Node], round: Int): Dataset[Binned] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(nodes)
    val updated = rows.map { r =>
      var n = 0
      val nd = bc.value
      while (!nd.get(n).isLeaf) {
        val x = nd.get(n)
        val b = r.bins(x.feat)
        n = if (b == -1) { if (x.defaultLeft) x.left else x.right }
            else if (b <= x.splitBin) x.left else x.right
      }
      // add the float32-truncated weight — exactly what the packed
      // booster will score — so training-time predictions (and any
      // early-stopping decision) match the final model bitwise
      r.copy(pred = r.pred + nd.get(n).leaf.toFloat.toDouble)
    }
    // cut lineage periodically so 100 rounds don't stack 100 map stages
    val persisted =
      if ((round + 1) % 16 == 0) updated.localCheckpoint(eager = true)
      else { updated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK); updated.count(); updated }
    rows.unpersist(blocking = false)
    persisted
  }

  /** Pack driver-side nodes into the xgboost array layout [[XgbBooster]]
    * scores (leaves carry their value in `cond`; left == −1 marks a
    * leaf), float32-truncating leaf weights exactly like the serialized
    * models the reference ships. */
  private def toBooster(trees: Seq[java.util.ArrayList[Node]], features: Seq[String],
                        p: GbtParams): XgbBooster = {
    val packed = trees.map { nodes =>
      val n = nodes.size()
      val feat = new Array[Int](n); val cond = new Array[Float](n)
      val left = new Array[Int](n); val right = new Array[Int](n)
      val dflt = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        val nd = nodes.get(i)
        if (nd.isLeaf) { feat(i) = 0; cond(i) = nd.leaf.toFloat; left(i) = -1; right(i) = -1; dflt(i) = false }
        else { feat(i) = nd.feat; cond(i) = nd.cond; left(i) = nd.left; right(i) = nd.right; dflt(i) = nd.defaultLeft }
        i += 1
      }
      XgbTree(feat, cond, left, right, dflt)
    }.toArray
    // margin-scale base: for binary:logistic the booster's raw output
    // is a margin (apply [[sigmoid]] for probabilities), mirroring
    // xgboost's ProbToMargin base_score handling
    new XgbBooster(p.baseMargin.toFloat, features.length, packed, features,
      p.objective)
  }

  /** Margin → probability for binary:logistic boosters:
    * `sigmoid(xgb_score(features, tag))`. */
  def sigmoid(margin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.lit(1.0) /
      (org.apache.spark.sql.functions.lit(1.0) +
        org.apache.spark.sql.functions.exp(org.apache.spark.sql.functions.negate(margin)))
}
