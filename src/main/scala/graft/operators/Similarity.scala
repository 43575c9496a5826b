package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity + approximate-nearest-neighbor search over an embedding
  * column (`array<float>`).
  *
  * Determinism note: dot products are LEFT FOLDS over the array in double
  * precision — a fixed accumulation order, so results are bit-identical
  * run-to-run and engine-to-engine (DuckDB's list_reduce folds in the same
  * order). Never use a parallel float reduction when results feed a
  * threshold. The folds are the native [[graft.functions.VectorExprs]]
  * expressions (codegen'd loop, identical semantics to the
  * `aggregate(zip_with(...))` formulation they replaced — which, being
  * lambda HOFs, ran INTERPRETED once per candidate pair and dominated the
  * pair stages); array casts are native `Cast`s, not `transform` lambdas,
  * for the same reason.
  *
  * Scale: brute-force is the correctness baseline (O(Q·N) with Q small —
  * a broadcast of the query set against a partitioned corpus, no shuffle of
  * the corpus). The sign-LSH variant buckets vectors by the sign pattern of
  * their leading dimensions — candidate generation becomes an equi-join on
  * the bucket key (one shuffle of (bucket, vector) postings), the standard
  * hyperplane-LSH layout with axis-aligned planes.
  */
object Similarity {

  private def toDouble(arr: Column): Column = arr.cast("array<double>")

  /** Left-fold dot product of two double arrays (native expression). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotColumn(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val (da, db) = (toDouble(a), toDouble(b))
    dot(da, db) / (norm(da) * norm(db))
  }

  /** Brute-force top-k cosine neighbors for each query vector.
    * Queries are expected to be a small set (broadcast side). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", norm(col("__qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    import org.apache.spark.sql.expressions.Window
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Embedding-space hard negatives (L150) — the dense twin of
    * [[Retrieval.hardNegatives]]'s lexical mining: per query vector, the
    * top-k cosine neighbors whose LABEL differs from the query's —
    * same-neighborhood, different-class, the pairs that teach a metric
    * model its hardest boundaries (Xiong et al. 2021's ANCE signal at
    * the data-prep tier). The label filter runs BEFORE the rank cut
    * (the hardNegatives discipline: a query whose neighborhood is
    * dominated by its own class still yields k true negatives).
    *
    * Scale shape: the brute-force scored frame with a broadcast query
    * side (the [[bruteForceTopK]] baseline — IVF pre-bucketing is the
    * corpus-scale path, graded by [[recallAtK]] against exactly this
    * output). */
  def embeddingHardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"k=$k")
    val q = broadcast(queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("__qv"), col(labelCol).as("__ql"))
      .withColumn("__qn", norm(col("__qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        toDouble(col(vecCol)).as("__cv"),
        col(labelCol).as("neighbor_label"))
      .withColumn("__cn", norm(col("__cv")))
    import org.apache.spark.sql.expressions.Window
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .filter(col("neighbor_label") =!= col("__ql")) // before the cut
      .withColumn("cos",
        dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("neighbor_label"), col("cos"))
  }

  /** Left-fold squared-L2 distance of two double arrays (fixed accumulation
    * order — the cross-engine determinism discipline of [[dot]]). */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.VectorExprs.sqDistColumn(a, b)

  /** IVF cell assignment: nearest coarse centroid by squared L2, ties to
    * the lowest cell id. The quantizer here is the FIXED "seed vectors as
    * centroids" scheme (cell k = the corpus vector with id k, k < numCells)
    * — deterministic and engine-checkable; production systems train
    * centroids offline and feed them in the same broadcast shape, the
    * index/search mechanics are identical.
    *
    * Scale shape: centroids broadcast (numCells × dim — KB), assignment is
    * one narrow pass over the corpus (no shuffle until the per-vector
    * argmin aggregation, keyed by vector id). */
  def ivfAssign(corpus: DataFrame, numCells: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfAssignTo(corpus, ivfCentroids(corpus, numCells, idCol, vecCol),
      idCol, vecCol)

  /** The broadcast coarse-quantizer table `(cell, __cv)`. */
  private def ivfCentroids(corpus: DataFrame, numCells: Int,
                           idCol: String, vecCol: String): DataFrame =
    broadcast(corpus.filter(col(idCol) < numCells)
      .select(col(idCol).as("cell"), toDouble(col(vecCol)).as("__cv")))

  private def ivfAssignTo(corpus: DataFrame, cents: DataFrame,
                          idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("__v"))
      .join(cents)
      .withColumn("__d", sqDist(col("__v"), col("__cv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("__d").as("d"), col("cell").as("cell"))).as("__m"))
      .select(col("vec_id"), col("__m.cell").as("cell"))

  /** IVF top-k search: each query probes its `nProbe` nearest cells and
    * ranks only the vectors assigned there — the classic inverted-file ANN
    * trade (recall < 1 when a true neighbor lives outside the probed
    * cells). Candidate cost is |corpus| × nProbe / numCells per query
    * instead of |corpus|. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numCells: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = ivfCentroids(corpus, numCells, idCol, vecCol)
    val asg = ivfAssignTo(corpus, cents, idCol, vecCol)
    // probe list per query (queries are a small broadcast-sized set);
    // the query norm is computed ONCE here, not per candidate pair
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__d"), col("cell"))
    val probes = broadcast(queries
      .select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
      .join(cents)
      .withColumn("__d", sqDist(col("__qv"), col("__cv")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__qn"), col("cell")))
    val cand = asg.join(probes, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
    val c = corpus.select(col(idCol).as("vec_id"),
        toDouble(col(vecCol)).as("__cv2"))
      .withColumn("__cn", norm(col("__cv2")))
    val scored = cand.join(c, Seq("vec_id"))
      .withColumn("cos", dot(col("__qv"), col("__cv2")) /
        (col("__qn") * col("__cn")))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"))
  }

  /** Sign-pattern bucket of the first `bits` dimensions (axis-aligned
    * hyperplane LSH). */
  def signBucket(vec: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      when(element_at(vec, i + 1).cast("double") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: candidates share the sign bucket; top-k within the
    * bucket. Recall < 1 by construction; pair cost drops by ~2^bits. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("__qv"),
      signBucket(col(vecCol), bits).as("__qb"))
      .withColumn("__qn", norm(col("__qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("__cv"),
      signBucket(col(vecCol), bits).as("__cb"))
      .withColumn("__cn", norm(col("__cv")))
    import org.apache.spark.sql.expressions.Window
    val scored = q.join(c, col("__qb") === col("__cb") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Embedding near-duplicate pairs within blocking keys (cosine ≥ threshold).
    * `blockCol` bounds the pair space (e.g. a cluster/label/LSH bucket). */
  def embeddingDupPairs(vectors: DataFrame, threshold: Double, blockCol: String,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // cast to double and compute each vector's norm ONCE before the pair
    // join — per-pair work drops from 3 array folds to 1
    val v = vectors.select(col(blockCol).as("__blk"), col(idCol).as("id"),
        toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    v.as("a").join(v.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.id") < col("b.id"))
      .withColumn("cos", dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"), col("cos"))
  }

  /** Per-group centroids: elementwise mean of the embedding vectors, one
    * output row per (group, dimension). The cross-row sum runs in FIXED
    * POINT (floor(v·10⁹) longs) — double accumulation depends on
    * partition/merge order, and decimal-casting doubles rounds differently
    * across engines at the last digit; floor of an exact double times a
    * power of ten is bit-identical everywhere. The ~1e-9 per-element
    * truncation is far below float input precision. One shuffle on
    * (group, pos); the flat output shape streams at any dimensionality. */
  def centroids(vectors: DataFrame, groupCol: String = "label",
                vecCol: String = "embedding"): DataFrame =
    vectors
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos"))
      .agg((sum(floor(col("v").cast("double") * lit(1e9)).cast("long"))
        .cast("double") / (count(lit(1)) * lit(1e9))).as("mean"))

  /** Recall@k of an approximate top-k result against exact ground truth —
    * the acceptance measurement every ANN index tuning loop runs (probe
    * widths, LSH bits) before an index goes live.
    *
    * Both inputs are (query_id, rank, neighbor_id, ...) frames as produced
    * by [[bruteForceTopK]] / [[lshTopK]] / [[ivfTopK]]. Per query:
    * |approx ∩ exact-top-k| / min(k, |exact|) — the denominator uses the
    * truth list's size so queries with fewer than k real neighbors aren't
    * penalized. Ground truth is usually computed on a small query SAMPLE
    * (truth is the quadratic side); the join here is id-only and
    * sample-sized, nowhere near corpus scale. */
  /** Eval-set EMBEDDING-NN leakage report — the semantic-contamination
    * audit n-gram decontamination ([[Decontaminate]]) cannot see: for
    * every benchmark document, its MAX-COSINE training neighbor and a
    * `leaked` verdict at `threshold` (a paraphrased or translated eval
    * item shares no 13-gram with its training twin, but their embeddings
    * sit at cosine ≈ 1).
    *
    * Scale shape — deliberately NOT [[bruteForceTopK]]'s window: the
    * benchmark side is broadcast (eval sets are small by construction),
    * the corpus is scanned ONCE, and the per-benchmark max rides a
    * hash aggregation with map-side partial combine (`max(struct(cos,
    * −neighbor))` — ties to the LOWEST neighbor id; an exact IEEE
    * comparison, engine-deterministic) — the train×bench score frame is
    * never shuffled, only |bench|-sized partials are. At larger eval
    * sets, pre-bucket with [[ivfTopK]]'s coarse quantizer and run this
    * per probed cell — the machinery exists; the exact pass here is the
    * ground-truth baseline [[recallAtK]] can grade that index against. */
  def nnLeakageReport(train: DataFrame, bench: DataFrame, threshold: Double,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(bench
      .select(col(idCol).as("doc_id"), toDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", norm(col("__qv"))))
    val c = train.select(col(idCol).as("__nid"),
        toDouble(col(vecCol)).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    c.crossJoin(q)
      .select(col("doc_id"),
        (dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
          .as("__cos"),
        col("__nid"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("__cos").as("c"), negate(col("__nid")).as("n")))
        .as("__b"))
      .select(col("doc_id"), negate(col("__b.n")).as("neighbor_id"),
        col("__b.c").as("max_cos"),
        (col("__b.c") >= lit(threshold)).as("leaked"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings" —
    * the CCMatrix/LASER alignment recipe): a candidate pair (x, y)
    * across two embedding spaces scores by the RATIO margin
    * cos(x,y) / ((avg cos of x's k-NN in B + avg cos of y's k-NN in A)/2)
    * — absolute cosine is miscalibrated across language pairs and hubs;
    * the margin normalizes by each side's local neighborhood density.
    * Output: side A's best candidate per vector with its margin and a
    * threshold verdict (the forward-mining direction; run with sides
    * swapped and intersect for the paper's strictest variant).
    *
    * Determinism contract: cosines quantize to integer NANO units per
    * pair (the left-fold [[dot]] then one round — the ann-gate
    * discipline); k-NN averages are floor divisions of exact nano sums;
    * the margin is one integer expression
    * `(2·cos_nano·10⁶) div (avgA + avgB)` — engine-exact end to end.
    * Pairs whose denominator is ≤ 0 (both neighborhoods anti-aligned)
    * are dropped — the margin is undefined there.
    *
    * Scale shape: the score frame is the A×B cross product — this is
    * the EXACT tier (the fixture/recall baseline); at corpus scale
    * pre-bucket candidates with [[ivfAssign]]/[[lshTopK]] and feed the
    * bucketed pairs through the same margin arithmetic ([[recallAtK]]
    * grades that path against this one). k-NN cuts are per-vector
    * windows bounded by the OTHER side's size; everything downstream is
    * output-sized. */
  /** The shared margin-scored candidate frame behind
    * [[bitextMarginPairs]] and [[bitextMutualBest]]: every (a, b)
    * candidate with its nano-quantized cosine and integer ratio margin
    * (negative-cosine candidates dropped — see bitextMarginPairs). */
  private def bitextMarginFrame(sideA: DataFrame, sideB: DataFrame, k: Int,
                                idCol: String,
                                vecCol: String): DataFrame = {
    require(k >= 1, s"k=$k")
    def side(df: DataFrame, id: String, v: String, n: String) =
      df.select(col(idCol).as(id), toDouble(col(vecCol)).as(v))
        .withColumn(n, norm(col(v)))
    val a = side(sideA, "__ia", "__av", "__an")
    val b = side(sideB, "__ib", "__bv", "__bn")
    val cross = a.crossJoin(b)
      .select(col("__ia"), col("__ib"),
        round(dot(col("__av"), col("__bv")) / (col("__an") * col("__bn"))
          * lit(1e9)).cast("long").as("__cn"))
      .localCheckpoint(true) // three consumers: two k-NN cuts + the join
    def knnAvg(key: String, out: String) = {
      val w = Window.partitionBy(col(key))
        .orderBy(col("__cn").desc,
          col(if (key == "__ia") "__ib" else "__ia").asc)
      cross.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
        .groupBy(col(key))
        .agg(expr("sum(__cn) div count(1)").as(out))
    }
    val withM = cross
      .join(knnAvg("__ia", "__ka"), Seq("__ia"))
      .join(knnAvg("__ib", "__kb"), Seq("__ib"))
      // a negative-cosine candidate is never a mined pair — dropping
      // them here keeps the margin's numerator non-negative (and a
      // vector whose every candidate is anti-aligned mines nothing and
      // emits no row); Spark `div` and DuckDB `//` both truncate toward
      // zero (verified), so the division agrees on signed values anyway
      .filter(col("__cn") >= 0 && col("__ka") + col("__kb") > 0)
      .withColumn("margin_micro",
        expr("(2 * __cn * 1000000) div (__ka + __kb)"))
    withM
  }

  def bitextMarginPairs(sideA: DataFrame, sideB: DataFrame, k: Int,
                        thresholdMicro: Long,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val withM = bitextMarginFrame(sideA, sideB, k, idCol, vecCol)
    val w = Window.partitionBy(col("__ia"))
      .orderBy(col("margin_micro").desc, col("__ib").asc)
    withM.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("__ia").as("vec_id_a"), col("__ib").as("vec_id_b"),
        col("__cn").as("cos_nano"), col("margin_micro"),
        (col("margin_micro") >= thresholdMicro).as("accepted"))
  }

  /** MUTUAL-best bitext pairs (L146) — the precision tier CCMatrix ships
    * on top of [[bitextMarginPairs]]'s per-A argmax: keep a candidate
    * only when a is b's best margin AND b is a's best (forward-backward
    * agreement kills hub vectors that win many one-directional argmaxes
    * but are nobody's mutual partner). Same margin frame, two argmax
    * windows, one equi-join of the two OUTPUT-sized best frames.
    * `accepted` carries the threshold verdict exactly as the one-sided
    * operator does. */
  def bitextMutualBest(sideA: DataFrame, sideB: DataFrame, k: Int,
                       thresholdMicro: Long,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    // two window consumers over the joined margin frame — checkpoint so
    // the knn joins don't run twice
    val withM = bitextMarginFrame(sideA, sideB, k, idCol, vecCol)
      .select(col("__ia"), col("__ib"), col("__cn"), col("margin_micro"))
      .localCheckpoint(true)
    val wa = Window.partitionBy(col("__ia"))
      .orderBy(col("margin_micro").desc, col("__ib").asc)
    val wb = Window.partitionBy(col("__ib"))
      .orderBy(col("margin_micro").desc, col("__ia").asc)
    val bestA = withM.withColumn("__rn", row_number().over(wa))
      .filter(col("__rn") === 1).drop("__rn")
    val bestB = withM.withColumn("__rn", row_number().over(wb))
      .filter(col("__rn") === 1)
      .select(col("__ia"), col("__ib"))
    bestA.join(bestB, Seq("__ia", "__ib"))
      .select(col("__ia").as("vec_id_a"), col("__ib").as("vec_id_b"),
        col("__cn").as("cos_nano"), col("margin_micro"),
        (col("margin_micro") >= thresholdMicro).as("accepted"))
  }

  /** IVF tuning table: recall@k per probe depth, the measurement that
    * justifies an nProbe choice (the `ann_recall` gate grades ONE
    * setting; a tuning decision needs the CURVE — where recall
    * saturates is where probing stops paying).
    *
    * One search at the WIDEST depth: candidates are scored once, each
    * carrying the probe rank of the cell it came from, and every
    * narrower sweep is a FILTER over the same scored frame (a cell
    * probed at depth p is probed at every depth ≥ p, so the depth-p
    * candidate set is exactly `probe_rank ≤ p`) — one corpus scan and
    * one window over candidates × |nProbes| instead of |nProbes|
    * re-searches.
    *
    * Output, one row per probe depth: (n_probe, n_queries, sum_truth,
    * sum_hits, recall_micro) with recall_micro = (10⁶·sum_hits) div
    * sum_truth — pooled-truth micro-averaged recall, all integer,
    * engine-exact. Depths whose sweep hits nothing still report (the
    * dimension comes from the literal list, not from observed hits).
    *
    * Scale shape: inherits [[ivfTopK]]'s (broadcast centroids + probes,
    * cell-keyed candidate join); the sweep explode multiplies only the
    * CANDIDATE frame (queries-bounded), never the corpus; the final
    * table is |nProbes| rows. The exact tier rides [[bruteForceTopK]]
    * — the documented ground-truth baseline, queries-bounded. */
  def ivfRecallSweep(corpus: DataFrame, queries: DataFrame, k: Int,
                     numCells: Int, nProbes: Seq[Int],
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k=$k")
    require(nProbes.nonEmpty && nProbes.forall(_ >= 1), s"nProbes=$nProbes")
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    val depths = nProbes.distinct.sorted
    val maxP = depths.last
    val cents = ivfCentroids(corpus, numCells, idCol, vecCol)
    val asg = ivfAssignTo(corpus, cents, idCol, vecCol)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__d"), col("cell"))
    val probes = broadcast(queries
      .select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
      .join(cents)
      .withColumn("__d", sqDist(col("__qv"), col("__cv")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= maxP)
      .select(col("query_id"), col("__qv"), col("__qn"), col("cell"),
        col("__pr")))
    val c = corpus.select(col(idCol).as("vec_id"),
        toDouble(col(vecCol)).as("__cv2"))
      .withColumn("__cn", norm(col("__cv2")))
    val scored = asg.join(probes, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(c, Seq("vec_id"))
      .withColumn("cos", dot(col("__qv"), col("__cv2")) /
        (col("__qn") * col("__cn")))
      .select(col("query_id"), col("vec_id"), col("cos"), col("__pr"))
      .localCheckpoint(true) // scored once, swept |nProbes| times
    val exact = bruteForceTopK(corpus, queries, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true) // two consumers: totals + hit semi-join
    val wRank = Window.partitionBy(col("n_probe"), col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val approx = scored
      .select(col("query_id"), col("vec_id"), col("cos"), col("__pr"),
        explode(array(depths.map(lit): _*)).as("n_probe"))
      .filter(col("__pr") <= col("n_probe"))
      .withColumn("__rk", row_number().over(wRank))
      .filter(col("__rk") <= k)
      .select(col("n_probe"), col("query_id"), col("vec_id").as("neighbor_id"))
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("n_probe")).agg(count(lit(1)).as("__h"))
    val totals = broadcast(exact.agg(
      countDistinct(col("query_id")).as("n_queries"),
      count(lit(1)).as("sum_truth")))
    import spark.implicits._
    depths.toDF("n_probe").crossJoin(totals)
      .join(broadcast(hits), Seq("n_probe"), "left")
      .select(col("n_probe"), col("n_queries"), col("sum_truth"),
        coalesce(col("__h"), lit(0L)).as("sum_hits"))
      // sum_truth = 0 (no queries, or every query's only vector is
      // itself) is "nothing to recall", not a division error: pin 0
      // rather than nulling where an integer engine would raise
      .withColumn("recall_micro",
        when(col("sum_truth") === 0L, 0L)
          .otherwise(expr("(1000000 * sum_hits) div sum_truth")))
  }

  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val a = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val e = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val truthSize = e.groupBy("query_id").agg(count(lit(1)).as("__n"))
    val hits = e.join(a, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("__hits"))
    truthSize.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("__hits"), lit(0L)).cast("double") /
          col("__n").cast("double")).as("recall"))
  }
}
