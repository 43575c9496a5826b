package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED document-quality classifier: full-batch logistic regression over
  * hashed bag-of-words features, learned with gradient descent — the
  * fastText-shaped "train a filter on labels, score the corpus" step of a
  * curation pipeline (reference quality scoring is heuristic-only; this is
  * the learning sibling of [[KMeans]] and [[BpeLearn]]).
  *
  * ENGINE-EXACT TRAINING, like every learned loop here:
  *  - features are token-count fractions over `buckets` md5-derived hash
  *    buckets (the [[TextAnalysis.classifierScores]] hash convention) plus
  *    a bias; each is ONE double division;
  *  - the margin z = w·x quantizes each product to integer NANO units
  *    before the in-row sum, so neither engine's addition order matters;
  *  - the link is the RATIONAL "fast sigmoid" σ(z) = 0.5 + z/(2·(1+|z|)) —
  *    +, ×, /, abs are all correctly-rounded IEEE ops, so both engines get
  *    the same bits; libm `exp` is NOT correctly rounded and Java/DuckDB
  *    may legally differ in the last ulp, which a hash gate would catch;
  *  - per-document gradient contributions quantize to integer MICRO units
  *    and integer-sum across the corpus (exact, order-free); only the
  *    driver's per-iteration weight update runs in doubles, on identical
  *    inputs with identical expression shape both engines reproduce.
  *
  * Scale shape: the feature frame (doc_id, label, buckets+1 doubles) is
  * built once — one narrow aggregation with conditional sums, no pivot, no
  * explode-regroup — and persisted; each iteration is then ONE map-side-
  * combined scalar aggregation over it (buckets+1 integer sums + a count)
  * and a driver update of buckets+1 doubles. Iterations cost no shuffle of
  * the corpus, and the model never exists as anything but literals in the
  * scoring projection — scoring is shuffle-free.
  */
object QualityModel {

  /** md5-derived token hash bucket (shared convention with
    * [[TextAnalysis.classifierScores]] and its proven oracle twin). */
  private def bucketOf(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok.cast("binary")), 1, 6), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Per-document features: x_j = (tokens in bucket j) / (doc tokens) for
    * j < buckets; callers append the implicit bias x_buckets = 1.0 in the
    * margin. `labelExpr` evaluates over the raw doc row to 0.0/1.0.
    * Zero-token documents have no features and drop (nothing to score). */
  def features(docs: DataFrame, buckets: Int, labelExpr: Column,
               idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"), labelExpr.cast("double").as("y"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("__b", bucketOf(col("tok"), buckets))
    // .otherwise(0L) is load-bearing: without it a bucket no token hits
    // sums to NULL (not 0), nulling the margin and silently dropping the
    // doc's gradient contribution
    val xs = (0 until buckets).map(j =>
      (sum(when(col("__b") === j, 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double")).as(s"x$j"))
    tok.groupBy(col("doc_id"), col("y")).agg(xs.head, xs.tail: _*)
  }

  /** STREAMING-SAFE feature twin of [[features]]: the same per-document
    * feature row computed as a pure in-row projection — tokens hash to
    * buckets once via an in-row transform, each x_j is a count over the
    * small int array — no explode, no groupBy, no state, so it runs in an
    * append-mode stream as-is (score incoming documents under a
    * batch-trained model, the [[Dsir.scoreStateless]] discipline).
    * Equivalence to the aggregation formulation is spec-enforced; the
    * BATCH trainer stays on [[features]] (the HOFs here are
    * CodegenFallback — fine per-row in a stream, wrong for the corpus-wide
    * training scan). Zero-token documents drop, matching [[features]]. */
  def featuresInRow(docs: DataFrame, buckets: Int, labelExpr: Column,
                    idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val xs = (0 until buckets).map(j =>
      (size(filter(col("__bs"), b => b === j)).cast("double") /
        size(col("__bs")).cast("double")).as(s"x$j"))
    docs
      .select(col(idCol).as("doc_id"), labelExpr.cast("double").as("y"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      // hash every token ONCE; the per-bucket counts then scan a small
      // int array instead of re-hashing per bucket
      .withColumn("__bs", transform(col("__toks"),
        t => bucketOf(t, buckets)))
      .select(col("doc_id") +: col("y") +: xs: _*)
  }

  /** z in NANO units as an integer column over a feature row: each
    * w_j·x_j product rounds to nanos independently, the sum is exact. */
  private def zNano(w: Array[Double], buckets: Int): Column =
    (0 until buckets).map(j =>
      round(lit(w(j)) * col(s"x$j") * lit(1e9)).cast("long"))
      .reduce(_ + _) +
      round(lit(w(buckets)) * lit(1.0) * lit(1e9)).cast("long")

  /** Fast sigmoid over a nano-quantized margin. EXPRESSION SHAPE IS
    * CONTRACT: the oracle mirrors it verbatim — change both or neither. */
  private def sigmoid(zn: Column): Column = {
    val z = zn.cast("double") / lit(1e9)
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
  }

  /** Train `iters` full-batch GD steps from w = 0; returns the learned
    * weights (length buckets+1, bias last). The feature frame is
    * persisted for the loop and released before returning. */
  def train(feats: DataFrame, buckets: Int, iters: Int, lr: Double)
      : Array[Double] = {
    require(iters >= 1, s"iters=$iters: need at least one step")
    val f = feats.persist()
    try {
      val w = Array.fill(buckets + 1)(0.0)
      var it = 0
      while (it < iters) {
        val resid = sigmoid(zNano(w, buckets)) - col("y")
        val gs = (0 until buckets).map(j =>
          sum(round(resid * col(s"x$j") * lit(1e6)).cast("long"))
            .as(s"g$j")) :+
          sum(round(resid * lit(1.0) * lit(1e6)).cast("long"))
            .as(s"g$buckets") :+ count(lit(1)).as("n")
        val row = f.agg(gs.head, gs.tail: _*).head()
        val n = row.getLong(buckets + 1)
        var j = 0
        while (j <= buckets) {
          // identical expression shape to the oracle's weight CTE
          w(j) = w(j) - lr * ((row.getLong(j).toDouble / 1e6) / n)
          j += 1
        }
        it += 1
      }
      w
    } finally f.unpersist()
  }

  /** Score a feature frame under learned weights: margin in nano units,
    * fast-sigmoid probability in micro units, predicted = z >= 0. Pure
    * projection over literals — shuffle-free. */
  def score(feats: DataFrame, w: Array[Double], buckets: Int): DataFrame = {
    val zn = zNano(w, buckets)
    feats.select(col("doc_id"), col("y").cast("long").as("label"),
      zn.as("z_nano"),
      round(sigmoid(zn) * lit(1e6)).cast("long").as("prob_micro"),
      (zn >= 0L).as("predicted"))
  }
}
