package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling — the DSIR recipe (Xie et al.
  * 2023, arXiv:2302.03169): estimate bag-of-hashed-n-gram distributions on
  * a small TARGET corpus (the domain you want more of) and on the RAW pool,
  * then weight every raw document by its log importance ratio
  * log w(x) = Σ_f c_x(f)·(log p_target(f) − log p_raw(f)). Downstream,
  * resample the pool ∝ w (the [[Sampling]] gates compose — the weight
  * column is just another rank key).
  *
  * Features are hashed (unigrams + bigrams → one of `numBuckets` buckets,
  * md5-derived so any engine reproduces the bucketing) — the paper's trick
  * that makes the estimator a FIXED-WIDTH table instead of an unbounded
  * vocabulary.
  *
  * Scale shape (100 TB): feature extraction is a narrow projection +
  * explode; both distribution estimates are one groupBy(bucket) each with
  * map-side combine onto at most `numBuckets` rows — the model is
  * KB-sized and BROADCAST into the scoring join, so the raw corpus never
  * shuffles: score = explode → broadcast-join ratio table → one
  * groupBy(doc_id) sum. Corpus-level totals ride one-row broadcasts
  * ([[LanguageModel.scoreDocuments]]'s discipline).
  *
  * Determinism contract (oracle parity): the per-bucket log-ratio is
  * quantized to integer MICRO-NATS once (round(Δln·10⁶) — bucket-table
  * sized, not corpus-sized work), and each document's weight is the exact
  * integer sum of cnt·ratio over its buckets — order-insensitive in any
  * engine.
  */
object Dsir {

  /** Hashed n-gram feature counts: (doc_id, bucket, cnt) — unigrams and
    * bigrams of the whitespace tokens, bucket = md5-derived hash of the
    * gram (salted, so co-existing hash uses can't correlate) mod
    * `numBuckets`. */
  def hashedFeatures(docs: DataFrame, numBuckets: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(numBuckets >= 2, s"numBuckets=$numBuckets")
    val grams = docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(concat(
        col("__toks"),
        when(size(col("__toks")) >= 2,
          transform(sequence(lit(1), size(col("__toks")) - 1),
            i => concat_ws(" ",
              element_at(col("__toks"), i),
              element_at(col("__toks"), i + 1))))
          .otherwise(array().cast("array<string>")))).as("gram"))
    grams
      .select(col("doc_id"),
        pmod(conv(substring(md5(concat(col("gram"), lit(":dsir"))
            .cast("binary")), 1, 6), 16, 10).cast("long"),
          lit(numBuckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Importance weights for every raw document. Output one row per raw
    * doc: (doc_id, n_feat, logw_micro) — total feature occurrences, and
    * the micro-nat log importance ratio (positive = more target-like than
    * the pool average; docs with no features weigh 0).
    *
    * Smoothing: p(b) = (c_b + addK) / (total + addK·numBuckets) on both
    * sides — every bucket has positive mass, the ratio is always finite. */
  def importanceWeights(raw: DataFrame, target: DataFrame, numBuckets: Int,
                        addK: Double = 1.0, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(addK > 0, s"addK=$addK: smoothing mass must be positive")
    val rawFeat = hashedFeatures(raw, numBuckets, idCol, textCol)
    val tgtCnt = hashedFeatures(target, numBuckets, idCol, textCol)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("__ct"))
    val rawCnt = rawFeat
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("__cr"))
    val tgtTot = tgtCnt.agg(sum(col("__ct")).as("__tt"))
    val rawTot = rawCnt.agg(sum(col("__cr")).as("__tr"))
    // bucket-sized ratio table, micro-nat quantized ONCE per bucket
    val ratio = rawCnt.join(tgtCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tgtTot)).crossJoin(broadcast(rawTot))
      .select(col("bucket"), round(
        (log((coalesce(col("__ct"), lit(0L)).cast("double") + lit(addK)) /
          (col("__tt").cast("double") + lit(addK) * lit(numBuckets.toDouble))) -
          log((col("__cr").cast("double") + lit(addK)) /
            (col("__tr").cast("double") + lit(addK) * lit(numBuckets.toDouble))))
          * lit(1e6)).cast("long").as("__ratio"))
    val scored = rawFeat.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_feat"),
        sum(col("cnt") * col("__ratio")).as("logw_micro"))
    raw.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"))
  }
}
