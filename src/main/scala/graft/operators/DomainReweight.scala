package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
  * Data Mixtures Speeds Up Language Model Pretraining"): per training
  * domain, measure the PROXY model's excess loss over a REFERENCE model
  * and take one exponentiated-gradient step on the domain weights —
  * domains where the proxy lags the reference most get upweighted, and
  * the resulting mixture is what the big run actually samples.
  *
  * The published update is w ← w · exp(η · excess_loss), normalized and
  * mixed with uniform. exp() is NOT bit-identical across engines, so the
  * gated contract here lives entirely in LOG space with integer
  * micro-nats (the [[LanguageModel]] determinism discipline): per-domain
  * mean losses are exact integer divisions of micro-nat sums, excess is
  * an integer max, and the EG step multiplies by the rational η =
  * etaNum/etaDen in integer arithmetic. `log_weight_micro` carries the
  * FULL information content of the unnormalized update (softmax
  * normalization only shifts log space by a shared constant);
  * [[mixedWeights]] derives the float mixture for consumers and is
  * spec-pinned, not oracle-gated — the same boundary
  * [[TextAnalysis.classifierScores]] draws around the sigmoid.
  *
  * Scale shape (100 TB): the two score frames are per-document
  * aggregates the LM operators already compute with doc-keyed shuffles;
  * this operator adds ONE groupBy over the domain column (domains number
  * dozens-to-thousands — the aggregate is dimension-sized) and pure
  * integer projections. Nothing here re-touches the corpus.
  *
  * One step per call, by design: DoReMi's outer loop re-trains the proxy
  * between steps — a new loss measurement, not a new operator. Chain
  * calls with updated score frames (and carry `log_weight_micro` forward
  * additively) for the multi-round schedule.
  */
object DomainReweight {

  /** One EG step in integer log space.
    *
    * `proxyScores` / `refScores`: per-document (doc_id, n_units,
    * score_micro) frames — [[LanguageModel.scoreDocuments]] /
    * [[LanguageModel.scoreDocumentsUnigram]] outputs adapt directly
    * (n_trans/n_tokens as units, lm_score as score; scores are ≤ 0
    * micro-nat log-probs, so loss = −score).
    *
    * Per domain (mean losses floor-divided on positive numerators — the
    * cross-engine-exact integer division):
    *  - loss_proxy_micro = Σ(−score_proxy) div Σ units_proxy,
    *  - loss_ref_micro   = Σ(−score_ref)   div Σ units_ref,
    *  - excess_micro     = max(loss_proxy − loss_ref, 0),
    *  - log_weight_micro = (etaNum · excess_micro) div etaDen.
    * Domains with zero scoreable units report zero loss (and so zero
    * excess) rather than dividing by zero.
    *
    * Output: (domain, n_docs, units_proxy, units_ref, loss_proxy_micro,
    * loss_ref_micro, excess_micro, log_weight_micro) — integer-pure (the
    * host_pagerank lesson: no IEEE value in a gated contract). */
  def excessWeights(docs: DataFrame, proxyScores: DataFrame,
                    refScores: DataFrame, groupCol: String = "source",
                    idCol: String = "doc_id",
                    etaNum: Long = 1L, etaDen: Long = 2L): DataFrame = {
    require(etaNum > 0 && etaDen > 0,
      s"eta must be a positive rational: $etaNum/$etaDen")
    def adapt(scores: DataFrame, tag: String) = {
      require(scores.columns.length == 3,
        s"score frame must be exactly (id, units, score_micro): " +
          s"got ${scores.columns.mkString(", ")} — select the three " +
          "columns (LM outputs carry an extra n_hit; drop it)")
      val Array(id, units, score) = scores.columns
      scores.select(col(id).as("doc_id"),
        col(units).as(s"__u_$tag"), (-col(score)).as(s"__l_$tag"))
    }
    val joined = docs
      .select(col(idCol).as("doc_id"), col(groupCol).as("domain"))
      .join(adapt(proxyScores, "p"), Seq("doc_id"), "left")
      .join(adapt(refScores, "r"), Seq("doc_id"), "left")
    val g = joined.groupBy(col("domain")).agg(
      count(lit(1)).as("n_docs"),
      sum(coalesce(col("__u_p"), lit(0L))).as("units_proxy"),
      sum(coalesce(col("__u_r"), lit(0L))).as("units_ref"),
      sum(coalesce(col("__l_p"), lit(0L))).as("__lp"),
      sum(coalesce(col("__l_r"), lit(0L))).as("__lr"))
    val lossP = when(col("units_proxy") > 0,
      expr("__lp div units_proxy")).otherwise(lit(0L))
    val lossR = when(col("units_ref") > 0,
      expr("__lr div units_ref")).otherwise(lit(0L))
    g.select(col("domain"), col("n_docs"),
        col("units_proxy"), col("units_ref"),
        lossP.as("loss_proxy_micro"), lossR.as("loss_ref_micro"))
      .withColumn("excess_micro",
        greatest(col("loss_proxy_micro") - col("loss_ref_micro"), lit(0L)))
      .withColumn("log_weight_micro",
        expr(s"($etaNum * excess_micro) div $etaDen"))
  }

  /** The float mixture consumers sample from: softmax of the log weights
    * mixed with uniform, w_d = (1−c)·softmax(lw)_d + c/K (DoReMi's
    * smoothing, c ≈ 0.01 keeps every domain alive). Runs over the
    * DOMAIN-sized frame only; exp() keeps this column out of gated
    * contracts (see object doc). Max-shifted before exponentiation so the
    * softmax is overflow-safe at any micro-nat magnitude. */
  /** Per-DOCUMENT excess loss — the document-level counterpart of
    * [[excessWeights]] (the RHO-loss selection signal, Mindermann et al.
    * 2022: points whose training loss most exceeds a reference/holdout
    * model's are the learnable-and-not-yet-learned ones): each document's
    * mean proxy and reference losses in integer micro-nats (floor
    * divisions of its own micro-nat sums) and their clamped difference.
    * Documents missing from a score frame (unscoreable) read zero loss.
    *
    * Output: (doc_id, loss_proxy_micro, loss_ref_micro, excess_micro) —
    * integer-pure; one doc-keyed join pair over frames the LM scorers
    * already produce with doc-keyed shuffles. */
  def docExcess(proxyScores: DataFrame, refScores: DataFrame): DataFrame = {
    def adapt(scores: DataFrame, tag: String) = {
      require(scores.columns.length == 3,
        s"score frame must be exactly (id, units, score_micro): " +
          s"got ${scores.columns.mkString(", ")}")
      val Array(id, units, score) = scores.columns
      scores.select(col(id).as("doc_id"),
        col(units).as(s"__u_$tag"), (-col(score)).as(s"__l_$tag"))
    }
    val j = adapt(proxyScores, "p")
      .join(adapt(refScores, "r"), Seq("doc_id"), "full")
    val lossP = when(coalesce(col("__u_p"), lit(0L)) > 0,
      expr("__l_p div __u_p")).otherwise(lit(0L))
    val lossR = when(coalesce(col("__u_r"), lit(0L)) > 0,
      expr("__l_r div __u_r")).otherwise(lit(0L))
    j.select(col("doc_id"),
        lossP.as("loss_proxy_micro"), lossR.as("loss_ref_micro"))
      .withColumn("excess_micro",
        greatest(col("loss_proxy_micro") - col("loss_ref_micro"), lit(0L)))
  }

  /** Excess-loss data selection: the documents whose [[docExcess]] clears
    * the exact (1 − keepFraction) quantile of the corpus's excess
    * distribution — "train on the top X% most informative data". The
    * threshold comes from [[CorpusStats.histogramQuantiles]]'s exact
    * integer-histogram quantile (cardinality-bounded state, no per-group
    * buffer), so the kept set is engine-exact; ties AT the threshold are
    * kept, so the selection can exceed keepFraction by the tie mass —
    * the deterministic reading (a hash tiebreak would be a different,
    * also-valid policy; this one never splits equal-signal documents).
    *
    * Scale shape: the excess frame aggregates to a (distinct excess
    * value)-sized histogram, the threshold broadcasts back as one row,
    * and the corpus-sized excess frame takes one filter — it never
    * re-shuffles. */
  def selectByExcess(excess: DataFrame, keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction < 1,
      s"keepFraction=$keepFraction must be in (0, 1)")
    val thr = CorpusStats.histogramQuantiles(
        excess.select(col("excess_micro"), lit("all").as("__g")),
        "__g", "excess_micro", Seq(1.0 - keepFraction))
      .select(col(s"q_${math.round((1.0 - keepFraction) * 100)}").as("__thr"))
    excess.crossJoin(broadcast(thr))
      .filter(col("excess_micro") >= col("__thr"))
      .drop("__thr")
  }

  def mixedWeights(excess: DataFrame, c: Double = 0.01): DataFrame = {
    require(c >= 0 && c < 1, s"uniform mixing c=$c must be in [0, 1)")
    val scal = excess.agg(
      max(col("log_weight_micro")).as("__mx"),
      count(lit(1)).as("__k"))
    val e = exp((col("log_weight_micro") - col("__mx")).cast("double") / 1e6)
    val withE = excess.crossJoin(broadcast(scal)).withColumn("__e", e)
    val tot = withE.agg(sum(col("__e")).as("__z"))
    withE.crossJoin(broadcast(tot))
      .withColumn("weight",
        lit(1.0 - c) * col("__e") / col("__z") + lit(c) / col("__k"))
      .drop("__mx", "__k", "__e", "__z")
  }
}
