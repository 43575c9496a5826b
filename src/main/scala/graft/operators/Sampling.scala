package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data pipelines.
  *
  * Everything is hash-gated, never RNG-gated: a row's fate is a pure
  * function of its key (+ salt), so samples are reproducible across runs,
  * engines and cluster layouts, survive retries/speculative execution, and
  * need no seed state distributed to executors. The gate is a string
  * comparison on an md5 hex prefix — the first 8 hex digits are a uniform
  * 32-bit draw, and comparing them against a literal hex threshold is
  * identical in every engine (the md5-everywhere determinism discipline
  * used across the dedup family).
  *
  * Scale shape: pure filter / projection — no shuffle, no UDF, no state.
  * Stratified variants compile the per-stratum thresholds into a CaseWhen,
  * so one pass decides everything.
  */
object Sampling {

  /** First 8 md5 hex digits of (key ":" salt) — a deterministic uniform
    * 32-bit draw as zero-padded hex. */
  def draw(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(":" + salt)).cast("binary")), 1, 8)

  /** `fraction` as an 8-hex-digit threshold; fraction >= 1 admits all
    * ("g" sorts after every hex digit). */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0, s"fraction must be >= 0, got $fraction")
    if (fraction >= 1.0) "g"
    else f"${(fraction * 4294967296.0).toLong}%08x"
  }

  /** Deterministic Bernoulli sample: keep rows whose draw falls under
    * `fraction`. */
  def bernoulli(df: DataFrame, fraction: Double, keyCol: String,
                salt: String = ""): DataFrame =
    df.filter(draw(col(keyCol), salt) < lit(thresholdHex(fraction)))

  /** Stratified sample: per-stratum keep fractions (e.g. downsample English
    * to 10%, keep low-resource languages whole). Strata absent from the map
    * get `defaultFraction`. */
  def stratified(df: DataFrame, strataCol: String,
                 fractions: Map[String, Double], keyCol: String,
                 defaultFraction: Double = 0.0,
                 salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(
      lit(thresholdHex(defaultFraction))) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(draw(col(keyCol), salt) < threshold)
  }

  /** Assign each row to a named split (train/val/test …) by cumulative hash
    * ranges. Weights are normalized; assignment is a pure function of the
    * key, so the same document lands in the same split in every run and
    * every engine — the property that keeps eval sets leak-free as the
    * corpus is re-processed. */
  def splitAssign(df: DataFrame, weights: Seq[(String, Double)],
                  keyCol: String, salt: String = "",
                  outCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0))
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
    val d = draw(col(keyCol), salt)
    // CaseWhen over the upper cut of each split; the last branch catches the
    // remainder exactly
    val assigned = weights.init.zip(cuts.tail.init).foldLeft(
      Option.empty[Column]) { case (acc, ((name, _), hi)) =>
      val cond = d < lit(thresholdHex(hi))
      Some(acc.map(_.when(cond, name)).getOrElse(when(cond, name)))
    } match {
      case Some(cw) => cw.otherwise(weights.last._1)
      case None     => lit(weights.last._1)
    }
    df.withColumn(outCol, assigned)
  }

  /** Stateless streaming twin of the cluster-aware leakage-safe split
    * (the `split_by_cluster` composition): `clusters` is the
    * batch-fitted (doc_id, cluster) map from the near-dup components
    * walk ([[Dedup.connectedComponents]] labels, singletons absent);
    * the stream assigns each document its cluster by broadcast LEFT
    * join (absent → its own id, exactly the batch fallback) and splits
    * by [[splitAssign]] — a pure projection of the cluster key, so
    * append mode needs no watermark and drained-stream ≡ batch by
    * construction. The leak-safety contract on a stream: a document
    * whose near-dup cluster was fitted lands in its CLUSTER's split
    * (it can never straddle train/test against its batch siblings);
    * a genuinely new document is its own singleton cluster until the
    * next components refit. */
  def splitByClusterStateless(docs: DataFrame, clusters: DataFrame,
                              weights: Seq[(String, Double)],
                              salt: String = "",
                              idCol: String = "doc_id"): DataFrame = {
    val reserved = Seq("cluster", "split", "__cl")
    require(!docs.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by splitByClusterStateless")
    val m = broadcast(
      clusters.select(col(idCol), col("cluster").as("__cl")))
    splitAssign(
      docs.join(m, Seq(idCol), "left")
        .withColumn("cluster", coalesce(col("__cl"), col(idCol)))
        .drop("__cl"),
      weights, keyCol = "cluster", salt = salt)
  }

  /** Weighted corpus mixing under per-source token budgets: within each
    * stratum (source, language, domain), documents are ordered by their
    * deterministic hash draw — a reproducible shuffle — and the prefix
    * whose cumulative token count stays within the stratum's budget is
    * kept. This is how a training mix hits "x billion tokens of source A,
    * y of source B" targets: the hash order makes the kept prefix a
    * uniform sample, and determinism makes the mix identical across runs
    * and engines. A document whose count CROSSES the budget line is cut
    * (strictly-under semantics) — budgets are honored as hard caps.
    * Strata absent from `budgets` are dropped entirely.
    *
    * Scale shape: the TWO-PHASE cut. Budget enforcement is a prefix sum in
    * (draw, key) order — inherently sequential — so a single window per
    * stratum funnels each stratum through ONE task (a handful of language
    * strata over a 100 TB corpus = a handful of tasks). Instead, the draw
    * is range-split by its first `drawPrefixLen` hex digits (a fixed-length
    * hex prefix orders exactly like the full draw, so bucket order IS draw
    * order):
    *  1. a narrow aggregation sums tokens per (stratum, bucket) — at most
    *     strata × 16^drawPrefixLen rows — and a window over THAT tiny
    *     aggregate computes each bucket's base offset (tokens in all
    *     earlier buckets of its stratum). Buckets whose base already
    *     exceeds the budget are dropped here, before any document moves.
    *  2. the corpus inner-joins the broadcast bucket offsets and runs the
    *     prefix sum per (stratum, bucket) — parallelism strata ×
    *     16^drawPrefixLen instead of strata — offset by the bucket base.
    * Identical kept set to the single-window formulation (spec-enforced);
    * the default 2 hex digits give 256 tasks per stratum, raise to 3 (4096)
    * for trillion-document strata. `drawPrefixLen = 0` keeps the legacy
    * single-window path (fine for small strata, required reading for the
    * semantics).
    *
    * NULL keys: a null `keyCol` has no md5 draw; it is coalesced to the
    * empty string, so null-keyed rows sort FIRST within their stratum
    * (matching ascending-nulls-first in the single-window formulation) and
    * share one draw — both paths keep the identical set of them.
    */
  def tokenBudgetMix(docs: DataFrame, strataCol: String,
                     budgets: Map[String, Long], tokenCountCol: String,
                     keyCol: String, salt: String = "",
                     drawPrefixLen: Int = 2): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetMix needs at least one budget")
    require(drawPrefixLen >= 0 && drawPrefixLen <= 8,
      s"drawPrefixLen must be in [0, 8], got $drawPrefixLen")
    val reserved = Seq("__draw", "__bkt", "__tok", "__base", "__cum")
    require(!docs.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by tokenBudgetMix")
    val budget = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (stratum, b)) =>
        when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    // a NULL key draws null; coalesce to "" so null-keyed rows keep the
    // single-window semantics in the bucketed path too ("" sorts before
    // every hex digit, exactly where ascending-nulls-first put them, and
    // becomes a joinable "" bucket instead of a null one the inner
    // equi-join would silently drop)
    val theDraw = coalesce(draw(col(keyCol), salt), lit(""))
    val W = org.apache.spark.sql.expressions.Window
    if (drawPrefixLen == 0) {
      val w = W.partitionBy(col(strataCol))
        .orderBy(theDraw, col(keyCol))
        .rowsBetween(W.unboundedPreceding, 0)
      docs
        .withColumn("__cum", sum(col(tokenCountCol)).over(w))
        .filter(col("__cum") <= budget)
        .drop("__cum")
    } else {
      val withDraw = docs
        .withColumn("__draw", theDraw)
        .withColumn("__bkt", substring(col("__draw"), 1, drawPrefixLen))
      // phase 1: bucket token sums + base offsets; the window runs over the
      // strata × 16^drawPrefixLen aggregate, never over documents
      val wBase = W.partitionBy(col(strataCol)).orderBy(col("__bkt"))
        .rowsBetween(W.unboundedPreceding, -1)
      val bases = withDraw
        .groupBy(col(strataCol), col("__bkt"))
        .agg(sum(col(tokenCountCol)).as("__tok"))
        .withColumn("__base", coalesce(sum(col("__tok")).over(wBase), lit(0L)))
        // a bucket starting past the budget can't keep any row (tokens are
        // non-negative); unbudgeted strata have a null budget and drop too
        .filter(col("__base") <= budget)
        .select(col(strataCol), col("__bkt"), col("__base"))
      // phase 2: prefix sum per (stratum, bucket), offset by the base;
      // the inner join doubles as the drop filter for pruned buckets
      val wIn = W.partitionBy(col(strataCol), col("__bkt"))
        .orderBy(col("__draw"), col(keyCol))
        .rowsBetween(W.unboundedPreceding, 0)
      withDraw
        .join(broadcast(bases), Seq(strataCol, "__bkt"))
        .withColumn("__cum",
          col("__base") + sum(col(tokenCountCol)).over(wIn))
        .filter(col("__cum") <= budget)
        .select(docs.columns.map(col).toSeq: _*)
    }
  }

  /** Temperature-flattened multilingual resampling (the mT5/XLM-R mixing
    * rule, arXiv:1910.10683 §3.4.3 shape): reweight strata so the kept
    * corpus's stratum shares are proportional to p_s^alpha, where p_s is
    * the stratum's weight share (rows, or a weight column such as token
    * counts). alpha = 1 keeps the natural distribution; alpha → 0 flattens
    * toward uniform; the standard mT5 setting is alpha = 0.3–0.7.
    *
    * Downsampling-only formulation: the keep fraction per stratum is
    * f_s = (p_min / p_s)^(1 - alpha) — the smallest stratum is kept whole
    * and every larger stratum is cut toward it, which needs no duplication
    * (upsampling a 100 TB corpus in place is the wrong tool; repeat epochs
    * at the loader instead). Keeps are hash-gated per row by the same md5
    * draw as [[bernoulli]], so the mix is a pure function of the corpus.
    *
    * Determinism: f_s is quantized to MICRO-PROBABILITIES
    * (floor(f·10⁶), stratum-table-sized work) before the integer-exact
    * threshold conversion, the [[graft.operators.Dsir]] micro-quantization
    * discipline — the only cross-engine float op is pow() on a handful of
    * stratum ratios, and a boundary-straddling ulp there is ~10⁻¹⁰ likely
    * per stratum.
    *
    * Scale shape: ONE narrow aggregation over strata (map-side combined),
    * a global min over that stratum-sized frame, a broadcast join of the
    * per-stratum thresholds, and a pure filter — the corpus itself never
    * shuffles. NULL-stratum rows drop (the inner equi-join never matches
    * null — same contract as [[tokenBudgetMix]]'s unbudgeted strata). */
  def temperatureMix(df: DataFrame, strataCol: String, alpha: Double,
                     keyCol: String, weightCol: Option[String] = None,
                     salt: String = ""): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val reserved = Seq("__w", "__minw", "__thr")
    require(!df.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by temperatureMix")
    val W = org.apache.spark.sql.expressions.Window
    val weight = weightCol.map(c => sum(col(c))).getOrElse(count(lit(1)))
    // per-stratum weights; the empty-partition window runs over the
    // strata-sized aggregate (a handful of rows), never over the corpus.
    // A stratum whose total weight is <= 0 (every doc zero-token, or a
    // negative weight column) is dropped here: it cannot anchor p_min
    // (ratio division by zero would NaN-poison every threshold) and there
    // is nothing meaningful to sample from it.
    val shares = df.groupBy(col(strataCol)).agg(weight.cast("double").as("__w"))
      .filter(col("__w") > 0)
      .withColumn("__minw", min(col("__w")).over(W.partitionBy()))
    // f_s = (min/w)^(1-alpha) in micro-probability units; w >= minw > 0 so
    // the ratio is in (0, 1] and the threshold in [0, 10^6]
    val thrMicro = floor(pow(col("__minw") / col("__w"), lit(1.0 - alpha)) * 1e6)
      .cast("long")
    // micro-probability -> 8-hex-digit draw threshold. The scaling runs as
    // DOUBLE multiply-then-divide with a floor — micro·2^32 ≈ 4.3·10^15
    // stays under 2^53 so the product is exact, and the one rounded
    // division is the same IEEE op in any engine (Spark's `/` has no
    // integer-division form, so the oracle must mirror the double math,
    // not `//`). f_s = 1 admits every row ("g" sorts after all hex digits)
    val thrHex = when(thrMicro >= 1000000L, lit("g"))
      .otherwise(format_string("%08x",
        floor(thrMicro.cast("double") * 4294967296.0 / 1000000.0).cast("long")))
    val thresholds = shares.select(col(strataCol), thrHex.as("__thr"))
    df.join(broadcast(thresholds), Seq(strataCol))
      .filter(draw(col(keyCol), salt) < col("__thr"))
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Per-group row cap — the CommonCrawl-style per-domain quota: keep at
    * most `maxPerGroup` rows per group, chosen deterministically by hash
    * draw (ties broken by the key), so the kept set is a uniform per-group
    * sample and a pure function of the corpus.
    *
    * Scale shape: a single per-group window funnels a hot domain's
    * millions of rows through one task. `subPartitions > 1` runs the rank
    * as an exact two-phase funnel (the [[TextAnalysis.vocabularyPerGroup]]
    * trick): top-maxPerGroup within (group, key-hash sub-partition) —
    * parallelism groups × subPartitions — then top-maxPerGroup of the
    * bounded survivors (≤ subPartitions·maxPerGroup rows per group). A row
    * in a group's global top-maxPerGroup by (draw, key) is necessarily in
    * its sub-partition's top-maxPerGroup, so the two-phase cut equals the
    * single-window one (spec-enforced). */
  def groupCap(df: DataFrame, groupCol: String, maxPerGroup: Int,
               keyCol: String, salt: String = "",
               subPartitions: Int = 1): DataFrame = {
    require(maxPerGroup >= 1, s"maxPerGroup=$maxPerGroup")
    require(subPartitions >= 1, s"subPartitions=$subPartitions")
    val W = org.apache.spark.sql.expressions.Window
    val d = coalesce(draw(col(keyCol), salt), lit(""))
    val funneled =
      if (subPartitions == 1) df
      else {
        val w1 = W.partitionBy(col(groupCol),
            pmod(xxhash64(col(keyCol)), lit(subPartitions.toLong)))
          .orderBy(d.asc, col(keyCol).asc)
        df.withColumn("__r1", row_number().over(w1))
          .filter(col("__r1") <= maxPerGroup).drop("__r1")
      }
    val w = W.partitionBy(col(groupCol)).orderBy(d.asc, col(keyCol).asc)
    funneled.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= maxPerGroup).drop("__r")
  }

  /** UniMax budget-constrained epoch allocation (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining", arXiv:2304.09151, Algorithm 1): given
    * per-stratum token counts n_s, a total training token budget, and a
    * per-stratum epoch cap E, allocate the budget by visiting strata
    * SMALLEST FIRST — each receives min(n_s·E, R/k) tokens where R is the
    * budget still unallocated and k the strata still unvisited. Small
    * strata saturate at their epoch cap; whatever they cannot absorb
    * flows to the larger ones, whose final quota is a uniform split of
    * the remainder. This COMPUTES the budget map [[tokenBudgetMix]]
    * consumes and the epoch counts [[graft.operators.Packing
    * .epochSchedule]] replays.
    *
    * Determinism contract: allocation is pure INTEGER arithmetic — the
    * uniform share is the floor division R div k, so every engine
    * reproduces the table bit-for-bit; `epochs_micro` is the integer
    * micro-epoch ratio alloc·10⁶ div n_s. Visit order is (n_s, stratum)
    * ascending — the stratum name breaks count ties.
    *
    * Scale shape: ONE map-side-combined aggregation over the corpus to
    * the stratum-sized count frame; the sequential scan runs on the
    * collected stratum table (dozens-to-hundreds of rows — the same
    * model-sized-collect discipline as [[graft.operators.DomainReweight]])
    * and returns as a literal frame. The corpus never shuffles.
    *
    * @return one row per stratum: (strataCol, n_tokens, alloc_tokens,
    *         epochs_micro), n_tokens-ascending visit order. */
  def epochAllocation(docs: DataFrame, strataCol: String,
                      tokenCountCol: String, totalBudget: Long,
                      maxEpochs: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget=$totalBudget")
    require(maxEpochs >= 1, s"maxEpochs=$maxEpochs")
    val spark = docs.sparkSession
    val counts = docs.groupBy(col(strataCol))
      .agg(sum(col(tokenCountCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (s, n) => (n, s) }
    var remaining = totalBudget
    var left = counts.length
    val rows = counts.map { case (s, n) =>
      val quota = if (left > 0) remaining / left else 0L
      val alloc = math.min(n * maxEpochs, quota)
      remaining -= alloc
      left -= 1
      (s, n, alloc, alloc * 1000000L / n)
    }
    import spark.implicits._
    rows.toSeq.toDF(strataCol, "n_tokens", "alloc_tokens", "epochs_micro")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): keep exactly `k` rows,
    * each row ranked by the E-S key u^(1/w) — a row's chance of making the
    * cut scales with its weight (quality score, token count, upvotes), but
    * no row appears twice and the draw is a pure function of the row key.
    * This is the one-pass answer to "give me 1M documents, quality-biased"
    * that per-row Bernoulli (which can't hit an exact k) and sort-by-weight
    * (which is deterministic top-k, not a sample) both miss.
    *
    * Determinism contract (oracle parity): the comparison key is realized
    * entirely in integer space — maximizing u^(1/w) is maximizing
    * ln(u)/w, so the key is `round(ln(u)·10⁶) div w` (micro-nats, the
    * [[graft.operators.LanguageModel]] quantization discipline) with
    * u = (draw32 + 1)/2³² ∈ (0,1] from the md5 draw. `div` truncates
    * toward zero in Spark exactly as DuckDB's `//` does (measured, see
    * bitext_margin), and the numerator is ≤ 0 in both, so the integer key
    * — and therefore the kept set — is bit-identical in any engine.
    * Ties (same key) break on the row key ascending.
    *
    * Rows whose weight is NULL or < 1 are EXCLUDED — E-S is undefined at
    * w ≤ 0, and excluding them keeps the integer division total.
    * `keyCol` must be unique (the family contract shared with
    * [[bernoulli]]/[[Packing.shardAssign]]): duplicate keys share one
    * draw and tie on the full sort key, leaving their relative order to
    * the engine.
    *
    * Scale shape: a corpus-wide top-k with a constant group — the
    * [[graft.operators.TextAnalysis.topNgrams]] exact bucketed two-phase
    * cut: phase 1 ranks within md5-bucket sub-partitions (a global top-k
    * row is top-k in its own bucket), phase 2 ranks the ≤ buckets·k
    * survivors through one final window. The corpus is scanned once and
    * never sorted through a single task. */
  def weightedSample(df: DataFrame, k: Int, weightCol: String,
                     keyCol: String, salt: String = "",
                     buckets: Int = 64): DataFrame = {
    require(k >= 1, s"k=$k")
    require(buckets >= 1, s"buckets=$buckets")
    val reserved = Seq("es_micro", "rank", "__lnm", "__brank")
    require(!df.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by weightedSample")
    val W = org.apache.spark.sql.expressions.Window
    val v = conv(draw(col(keyCol), salt), 16, 10).cast("long")
    val u = (v + lit(1L)).cast("double") / lit(4294967296.0)
    val scored = df
      .filter(col(weightCol).isNotNull && col(weightCol) >= 1)
      .withColumn("__lnm", round(log(u) * lit(1e6)).cast("long"))
      .withColumn("es_micro",
        expr(s"__lnm div cast($weightCol as bigint)"))
      .drop("__lnm")
    val order: Seq[Column] = Seq(col("es_micro").desc, col(keyCol).asc)
    val pruned =
      if (buckets == 1) scored
      else {
        val bw = W.partitionBy(
            pmod(xxhash64(col(keyCol).cast("string")), lit(buckets.toLong)))
          .orderBy(order: _*)
        scored.withColumn("__brank", row_number().over(bw))
          .filter(col("__brank") <= k).drop("__brank")
      }
    pruned
      .withColumn("rank", row_number().over(W.partitionBy().orderBy(order: _*)))
      .filter(col("rank") <= k)
  }
}
