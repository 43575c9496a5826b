package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compression layer that makes
  * billion-vector ANN affordable: split each d-dim embedding into `m`
  * contiguous subvectors, train an independent k-means codebook per
  * subspace ([[KMeans]] — already deterministic), and store each vector as
  * `m` small cell ids instead of d floats. A 64-dim float vector at m=8,
  * k=256 compresses 256 bytes → 8 bytes; distance evaluation against a
  * query becomes `m` table lookups (ADC) instead of d multiplies.
  *
  * Scale shape (100 TB of embeddings):
  *  - training runs on a SAMPLE (codebooks need thousands of vectors per
  *    cell, not the corpus) — pass a sampled frame to [[fit]]; the m
  *    sub-trainings iterate over that sample only;
  *  - encoding is the corpus-sized pass: ONE broadcast of all m codebooks
  *    (m·k·(d/m) doubles = k·d — kilobytes) and one narrow projection per
  *    vector; the per-subspace argmin runs as a fold over the broadcast
  *    list inside the row, so encoding never shuffles the corpus at all;
  *  - ADC scoring broadcasts the per-query lookup tables the same way.
  *
  * Determinism: inherits [[KMeans]]' contract (fixed seeds, fixed-point
  * means, lowest-cell tie-breaks) per subspace; encoding ties also break
  * to the lowest cell id.
  */
object ProductQuantization {

  private def toDouble(arr: Column): Column = arr.cast("array<double>")

  /** Train per-subspace codebooks: returns (subspace, cell, centroid) —
    * subspace j's centroids live in that subspace's d/m dims. `dim` is the
    * full vector dimensionality (validated against divisibility, not
    * inferred — schema metadata doesn't carry array lengths). Train on a
    * deterministic sample at corpus scale ([[Sampling.bernoulli]]).
    *
    * The m trainings run as ONE [[KMeans.lloydKeyed]] loop over
    * (subspace, subvector) rows — every aggregation is keyed by subspace,
    * so each codebook is bit-identical to training its slice alone
    * (spec-checked against per-subspace [[KMeans.fit]]; the `pq_codes`
    * oracle replays the per-subspace chains), while the job count per
    * round is 1 instead of m. All subspaces share the k lowest-id seed
    * vectors, so the seed cut is one TakeOrdered, no per-group window. */
  def fit(vectors: DataFrame, dim: Int, m: Int, k: Int, iters: Int = 3,
          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim not divisible into m=$m blocks")
    require(iters >= 1, s"iters=$iters")
    val subDim = dim / m
    def explodeSubs(df: DataFrame, outCol: String): DataFrame =
      df.select(col("vec_id"), col("cell"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("__v"), j * lit(subDim) + lit(1), lit(subDim))))
          .as(Seq("subspace", outCol)))
    val base = vectors.select(col(idCol).as("vec_id"),
      toDouble(col(vecCol)).as("__v"))
    val exploded = explodeSubs(base.withColumn("cell", lit(0)), "__sub")
      .select(col("subspace"), col("vec_id"), col("__sub"))
    // seeds: the k lowest-id vectors, cells numbered in id order — the
    // same ids seed every subspace, so one global TakeOrdered cut feeds
    // all m seed sets
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    val seedBase = base.orderBy(col("vec_id")).limit(k)
      .withColumn("cell", (row_number().over(w) - 1).cast("int"))
    var cents = explodeSubs(seedBase, "centroid")
      .select(col("subspace"), col("cell"), col("centroid"))
    for (i <- 1 to iters)
      cents = KMeans.maybeCheckpoint(
        KMeans.lloydKeyed(exploded, cents, "subspace", "vec_id", "__sub"),
        i, iters)
    cents
  }

  /** Encode the corpus against trained codebooks: (vec_id, codes) where
    * codes[j] = nearest cell of subspace j (squared L2, ties to the lowest
    * cell). The codebooks collapse to ONE broadcast row of
    * `array<array<array<double>>>` (subspace → cell → centroid) and the
    * whole encode is a narrow projection — per-subspace argmin folds over
    * the in-row broadcast literal; the corpus never shuffles. */
  def encode(vectors: DataFrame, codebooks: DataFrame, m: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // (subspace → cells ordered by id) as one nested-array row; sort_array
    // on (subspace|cell, centroid) structs pins the nesting order
    val packed = broadcast(codebooks
      .groupBy(col("subspace"))
      .agg(transform(array_sort(collect_list(struct(col("cell"), col("centroid")))),
        c => c("centroid")).as("__cells"))
      .groupBy()
      .agg(transform(array_sort(collect_list(struct(col("subspace"), col("__cells")))),
        s => s("__cells")).as("__books")))
    // per-subspace argmin as ONE native codegen'd kernel — the
    // transform-of-aggregate HOF fold it replaced interpreted
    // m × cells × subDim expression-tree evaluations per vector
    // (equivalence property-checked; ties and null-skip identical)
    val codes = graft.functions.PqExprs.pqEncode(
      toDouble(col("__v")), col("__books"))
    vectors.select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .join(packed)
      .select(col("vec_id"), codes.as("codes"))
  }

  /** Train the ENTIRE IVF-PQ index — coarse router + all m subspace
    * codebooks — in ONE keyed Lloyd loop: the full-dimension coarse
    * training rides the same broadcast/assignment/mean jobs as the
    * subspace trainings, keyed as group -1 (every aggregation in
    * [[KMeans.lloydKeyed]] is group-keyed, so each trajectory is
    * bit-identical to training alone — the coarse rows' longer arrays and
    * different cell count coexist with the slices in the same frame).
    * Returns (coarse, codebooks) ready for [[ivfPqTopK]]. One iteration
    * budget governs both (the common production choice); train on a
    * sample at corpus scale. */
  def ivfPqFit(vectors: DataFrame, dim: Int, m: Int, coarseK: Int, pqK: Int,
               iters: Int = 3, idCol: String = "vec_id",
               vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    require(m >= 1 && dim % m == 0, s"dim=$dim not divisible into m=$m blocks")
    require(iters >= 1, s"iters=$iters")
    val subDim = dim / m
    def slices(df: DataFrame, outCol: String, upTo: Column): DataFrame =
      df.select(col("vec_id"), col("cell"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("__v"), j * lit(subDim) + lit(1), lit(subDim))))
          .as(Seq("subspace", outCol)))
        .filter(col("cell") <= upTo)
    val base = vectors.select(col(idCol).as("vec_id"),
      toDouble(col(vecCol)).as("__v"))
    // one frame, m+1 groups: subspace slices plus the full vector as -1
    def withFull(df: DataFrame, outCol: String): DataFrame =
      slices(df, outCol, lit(Int.MaxValue)).unionByName(
        df.select(col("vec_id"), col("cell"), lit(-1).as("subspace"),
          col("__v").as(outCol)))
    val exploded = withFull(base.withColumn("cell", lit(0)), "__sub")
      .select(col("subspace"), col("vec_id"), col("__sub"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    val maxK = math.max(coarseK, pqK)
    val seedBase = base.orderBy(col("vec_id")).limit(maxK)
      .withColumn("cell", (row_number().over(w) - 1).cast("int"))
    // per-group seed budgets differ: slices keep pqK cells, coarse keeps
    // coarseK — the same k-lowest-id discipline as the solo trainers
    val seeds = slices(seedBase, "centroid", lit(pqK - 1)).unionByName(
      seedBase.filter(col("cell") <= coarseK - 1)
        .select(col("vec_id"), col("cell"), lit(-1).as("subspace"),
          col("__v").as("centroid")))
      .select(col("subspace"), col("cell"), col("centroid"))
    var cents = seeds
    for (i <- 1 to iters)
      cents = KMeans.maybeCheckpoint(
        KMeans.lloydKeyed(exploded, cents, "subspace", "vec_id", "__sub"),
        i, iters)
    val coarse = cents.filter(col("subspace") === -1)
      .select(col("cell"), col("centroid"))
    val books = cents.filter(col("subspace") >= 0)
    (coarse, books)
  }

  /** IVF-PQ top-k — the production billion-vector index shape (FAISS's
    * IVFPQ): a coarse quantizer (trained [[KMeans]] centroids) routes each
    * query to its `nProbe` nearest cells, and ADC scores ONLY the codes
    * assigned there — candidate cost drops to |corpus|·nProbe/|cells| per
    * query, each candidate costing m table lookups instead of d multiplies.
    *
    * Scale shape: both the coarse centroid table and the codebooks are
    * KB-sized broadcasts; the corpus-side work is one assignment pass +
    * one shuffle-free encode, both reusable across query batches (persist
    * the (vec_id, cell, codes) frame as the index). The probe join is a
    * broadcast of (query, cell) pairs; no corpus shuffle anywhere.
    * Recall < 1 by construction (a true neighbor outside the probed cells,
    * or ranked away by quantization error) — measure with
    * [[Similarity.recallAtK]] before widening nProbe. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, coarse: DataFrame,
                codebooks: DataFrame, m: Int, k: Int, nProbe: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && nProbe >= 1, s"k=$k nProbe=$nProbe")
    val asg = KMeans.assign(corpus, coarse, idCol, vecCol)
      .select(col("vec_id"), col("cell"))
    val codes = encode(corpus, codebooks, m, idCol, vecCol)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__d"), col("cell"))
    val probes = broadcast(queries
      .select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("__q"))
      .join(broadcast(coarse))
      .withColumn("__d", Similarity.sqDist(col("__q"), col("centroid")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("cell")))
    val cand = asg.join(probes, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
    // per-query ADC lookup tables, exactly the [[adcTopK]] construction
    val cellDists = queries
      .select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("__q"))
      .crossJoin(codebooks)
      .withColumn("__d", Similarity.sqDist(
        slice(col("__q"),
          col("subspace") * size(col("centroid")) + lit(1),
          size(col("centroid"))),
        col("centroid")))
    val tables = broadcast(cellDists
      .groupBy(col("query_id"), col("subspace"))
      .agg(transform(array_sort(collect_list(struct(col("cell"), col("__d")))),
        c => c("__d")).as("__dists"))
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("subspace"), col("__dists")))),
        s => s("__dists")).as("__tables")))
    val approx = cand.join(codes, Seq("vec_id")).join(tables, Seq("query_id"))
      .withColumn("adc_dist",
        graft.functions.PqExprs.adcDist(col("codes"), col("__tables")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
    approx
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("adc_dist"))
  }

  /** Asymmetric-distance (ADC) top-k: score PQ codes against full-precision
    * query vectors via per-query lookup tables — the table for query q is
    * table[j][c] = sqDist(q's subspace j, codebook[j][c]), so a candidate's
    * approximate distance is m table lookups + m-1 adds. Tables for the
    * (small) query set broadcast like the codebooks; scoring is a narrow
    * pass over the codes plus one per-query top-k window. */
  def adcTopK(codes: DataFrame, queries: DataFrame, codebooks: DataFrame,
              m: Int, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // (query_id, tables: subspace → cell → dist); the subspace width comes
    // off each codebook row (size of its centroid) — no driver action
    val cellDists = queries
      .select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("__q"))
      .crossJoin(codebooks)
      .withColumn("__d", Similarity.sqDist(
        slice(col("__q"),
          col("subspace") * size(col("centroid")) + lit(1),
          size(col("centroid"))),
        col("centroid")))
    val tables = broadcast(cellDists
      .groupBy(col("query_id"), col("subspace"))
      .agg(transform(array_sort(collect_list(struct(col("cell"), col("__d")))),
        c => c("__d")).as("__dists"))
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("subspace"), col("__dists")))),
        s => s("__dists")).as("__tables")))
    import org.apache.spark.sql.expressions.Window
    val approx = codes.join(tables)
      .withColumn("adc_dist",
        graft.functions.PqExprs.adcDist(col("codes"), col("__tables")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
    approx
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("adc_dist"))
  }
}
