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

  /** The unigram+bigram gram array over a PRE-PROJECTED token column, in
    * token order. `toks` must be a bound column reference, not the
    * tokenization expression itself — `element_at` inside the bigram
    * lambda re-evaluates its receiver, so an inlined `tokens(text)` would
    * re-tokenize the document once per bigram (measured 3× slower at
    * sf0.1). */
  private def gramArrayFromToks(toks: Column): Column =
    concat(
      toks,
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ",
            element_at(toks, i),
            element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>")))

  /** The md5-derived feature bucket of one gram (salted, so co-existing
    * hash uses can't correlate). */
  private def bucketOf(gram: Column, numBuckets: Int): Column =
    pmod(graft.functions.Md5Prefix.prefix(concat(gram, lit(":dsir")), 6),
      lit(numBuckets.toLong))

  /** Hashed n-gram feature counts: (doc_id, bucket, cnt) — unigrams and
    * bigrams of the whitespace tokens, bucket = md5-derived hash of the
    * gram mod `numBuckets`. */
  def hashedFeatures(docs: DataFrame, numBuckets: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(numBuckets >= 2, s"numBuckets=$numBuckets")
    // native all-windows scans (uni + bi) concatenated in ONE corpus pass
    // — the HOF gram array ran ArrayFilter/ArrayTransform interpreted
    // under the corpus-wide explode. Same gram MULTISET in the same
    // order: tokens, then adjacent bigrams ([] for sub-2-token docs).
    docs
      .select(col(idCol).as("doc_id"),
        explode(concat(
          graft.functions.WordShingles.allShingles(col(textCol), 1),
          graft.functions.WordShingles.allShingles(col(textCol), 2)))
          .as("gram"))
      .select(col("doc_id"), bucketOf(col("gram"), numBuckets).as("bucket"))
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
  /** The trained model: (bucket, ratio) — each bucket's micro-nat log
    * importance ratio under add-k smoothing, quantized ONCE (bucket-table
    * sized work). Buckets never seen in `raw` are absent (they cannot
    * occur in raw documents; stateless scoring of OTHER corpora treats
    * them as zero-contribution, see [[scoreStateless]]). The natural
    * persistence unit — write once, score many batches or a stream. */
  /** (bucket, ratio) from the two bucket-count frames — the shared core
    * of [[ratioTable]] and [[importanceWeights]]. */
  private def ratioFromCounts(rawCnt: DataFrame, tgtCnt: DataFrame,
                              numBuckets: Int, addK: Double): DataFrame = {
    require(addK > 0, s"addK=$addK: smoothing mass must be positive")
    val tgtTot = tgtCnt.agg(sum(col("__ct")).as("__tt"))
    val rawTot = rawCnt.agg(sum(col("__cr")).as("__tr"))
    rawCnt.join(tgtCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tgtTot)).crossJoin(broadcast(rawTot))
      .select(col("bucket"), round(
        (log((coalesce(col("__ct"), lit(0L)).cast("double") + lit(addK)) /
          (col("__tt").cast("double") + lit(addK) * lit(numBuckets.toDouble))) -
          log((col("__cr").cast("double") + lit(addK)) /
            (col("__tr").cast("double") + lit(addK) * lit(numBuckets.toDouble))))
          * lit(1e6)).cast("long").as("ratio"))
  }

  def ratioTable(raw: DataFrame, target: DataFrame, numBuckets: Int,
                 addK: Double = 1.0, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    ratioFromCounts(
      hashedFeatures(raw, numBuckets, idCol, textCol)
        .groupBy(col("bucket")).agg(sum(col("cnt")).as("__cr")),
      hashedFeatures(target, numBuckets, idCol, textCol)
        .groupBy(col("bucket")).agg(sum(col("cnt")).as("__ct")),
      numBuckets, addK)

  def importanceWeights(raw: DataFrame, target: DataFrame, numBuckets: Int,
                        addK: Double = 1.0, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    // ONE rawFeat subtree feeds both the raw bucket counts and the scoring
    // join — Spark's exchange reuse computes the feature aggregation once
    // (building the counts from a second hashedFeatures call defeats the
    // reuse and was measured 3× slower at sf0.1)
    val rawFeat = hashedFeatures(raw, numBuckets, idCol, textCol)
    val ratio = ratioFromCounts(
      rawFeat.groupBy(col("bucket")).agg(sum(col("cnt")).as("__cr")),
      hashedFeatures(target, numBuckets, idCol, textCol)
        .groupBy(col("bucket")).agg(sum(col("cnt")).as("__ct")),
      numBuckets, addK)
      .withColumnRenamed("ratio", "__ratio")
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

  /** Stateless scoring against a trained [[ratioTable]]: the model packs
    * into ONE broadcast map row and each document's weight is an in-row
    * fold over its gram array — no explode, no join shuffle, no
    * aggregation state. Because it is a pure projection it runs UNCHANGED
    * on a STREAMING frame (append mode, no watermark) — the scoring half
    * of DSIR selection on an ingest stream, with the model trained once
    * offline. Integer micro-nat sums in gram order equal the batch path's
    * any-order sums exactly (spec-checked identical to
    * [[importanceWeights]]). Grams whose bucket the model never saw
    * (impossible when the model's own raw pool produced the document;
    * possible on fresh stream content) contribute nothing and are
    * excluded from n_feat — the batch path's inner-join semantics. */
  def scoreStateless(docs: DataFrame, ratios: DataFrame, numBuckets: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(numBuckets >= 2, s"numBuckets=$numBuckets")
    val packed = broadcast(ratios
      .groupBy()
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("ratio")))).as("__m"))
      .withColumn("__k", lit(1)))
    val folded = aggregate(gramArrayFromToks(col("__toks")),
      struct(lit(0L).as("n"), lit(0L).as("s")),
      (acc, g) => {
        val r = element_at(col("__m"), bucketOf(g, numBuckets))
        when(r.isNotNull,
          struct((acc("n") + lit(1L)).as("n"), (acc("s") + r).as("s")))
          .otherwise(acc)
      })
    docs.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("__k", lit(1))
      .join(packed, Seq("__k"))
      .select(col(idCol).as("doc_id"),
        folded.getField("n").as("n_feat"),
        folded.getField("s").as("logw_micro"))
  }
}
