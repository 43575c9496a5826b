package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the trainer
  * behind every coarse quantizer in this family ([[Similarity.ivfTopK]]
  * consumes the centroid table as its cell structure; product-quantization
  * codebooks and embedding-space corpus clustering are the same loop).
  *
  * Determinism contract (the whole point of this variant): every source of
  * run-to-run or engine-to-engine drift is pinned —
  *  - init is the k lowest-id vectors (no random restarts; callers wanting
  *    k-means++ seed externally and pass the result to [[lloyd]]);
  *  - assignment ties break to the lowest cell id;
  *  - the centroid mean uses the fixed-point discipline of
  *    [[Similarity.centroids]]: per-dimension sums of floor(v·10⁹) longs
  *    (exact integer addition in any order), divided once in double —
  *    bit-identical regardless of partition order or engine;
  *  - distances are [[Similarity.sqDist]] left folds (fixed accumulation
  *    order).
  * A fixed iteration budget (no data-dependent stopping) keeps the whole
  * trajectory a pure function of (vectors, k, iters).
  *
  * Scale shape (100 TB): centroids are k×dim — broadcast; one Lloyd round
  * is a narrow corpus pass (broadcast join + per-vector argmin rides one
  * aggregation keyed by vec_id) plus a (cell, pos)-keyed mean aggregation
  * whose output is centroid-sized. Nothing corpus-sized ever sits on the
  * driver; centroid tables checkpoint every [[CheckpointInterval]] rounds
  * (and always at the end), so lineage depth stays bounded without paying
  * one fixed-cost job per round on short trainings (see
  * [[maybeCheckpoint]]).
  *
  * Empty cells keep their previous centroid (the standard no-reseed
  * choice, and the only deterministic one without a distance-to-cell
  * re-ranking pass).
  */
object KMeans {

  private def toDouble(arr: Column): Column = arr.cast("array<double>")

  /** Deterministic seed centroids: the k lowest-id vectors, cells numbered
    * 0..k-1 in id order. Output (cell, centroid). */
  def initCentroids(vectors: DataFrame, k: Int, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k=$k")
    // k rows: the single-partition window is fine AFTER the TakeOrdered cut
    val w = Window.orderBy(col(idCol))
    vectors.orderBy(col(idCol)).limit(k)
      .select(col(idCol), toDouble(col(vecCol)).as("centroid"))
      .withColumn("cell", (row_number().over(w) - 1).cast("int"))
      .select(col("cell"), col("centroid"))
  }

  /** Nearest-centroid assignment: (vec_id, cell, dist) — squared L2, ties
    * to the lowest cell id. `centroids` is (cell, centroid) as produced by
    * [[initCentroids]] / [[fit]]; it is broadcast (k×dim).
    *
    * PRECONDITIONS (where the in-row argmin differs from a min-over-join
    * formulation in degenerate inputs): vectors must be FINITE — a NaN
    * element makes every distance NaN and yields a null cell/dist row
    * (the join shape arbitrarily picked the lowest cell id); `centroids`
    * must be NON-EMPTY — an empty frame yields null-cell rows rather
    * than an empty result; and `idCol` is treated as unique — duplicate
    * ids pass through as duplicate rows. All three hold by construction
    * for [[initCentroids]]/[[fit]]-produced centroids and parquet-sourced
    * embeddings; callers feeding foreign frames should filter NaNs and
    * assert k > 0 first. */
  def assign(vectors: DataFrame, centroids: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // in-row argmin over the packed centroid list (ONE broadcast row,
    // narrow codegen'd projection) — the broadcast-join formulation
    // exploded every vector into k rows and paid a vec_id-keyed exchange
    // to take the min back out. Distance/tie semantics are identical
    // (index-order (a-b)², ties to the lowest cell — positions are packed
    // in cell-id order and mapped back through the id array, so
    // non-contiguous cell ids stay correct). Same aggregation-free shape
    // the PQ encoder uses; equivalence is pinned by the kmeans gates and
    // the per-subspace-assign spec.
    val byCell = array_sort(collect_list(struct(col("cell"), col("centroid"))))
    val packed = broadcast(centroids.groupBy()
      .agg(transform(byCell, x => x("centroid")).as("__cells"),
        transform(byCell, x => x("cell")).as("__ids")))
    val nc = graft.functions.PqExprs.nearestCell(col("__v"), col("__cells"))
    vectors
      .select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("__v"))
      .join(packed)
      .select(col("vec_id"),
        element_at(col("__ids"), nc.getField("cell") + 1).as("cell"),
        nc.getField("dist").as("dist"))
  }

  /** One Lloyd round: assign every vector, recompute per-cell fixed-point
    * means, keep the previous centroid for cells that lost every member.
    *
    * Same finite-vector / non-empty-centroid preconditions as [[assign]].
    * Additionally each input ROW is one mass unit: the old
    * groupBy(vec_id)+first shape counted duplicate ids once, this one
    * counts every row — identical whenever ids are unique (true for all
    * in-repo callers; the gates' unrolled-CTE oracles pin it). */
  def lloyd(vectors: DataFrame, centroids: DataFrame,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // in-row argmin over the packed centroid list (see [[assign]]) — the
    // join formulation exploded vectors × k and paid a vec_id-keyed
    // exchange per round to take the min back out. Assignment semantics
    // are identical (index-order (a-b)², ties to the lowest cell), so
    // the trajectory — and the unrolled-CTE oracles that replay it — is
    // unchanged bit for bit.
    val byCell = array_sort(collect_list(struct(col("cell"), col("centroid"))))
    val packed = broadcast(centroids.groupBy()
      .agg(transform(byCell, x => x("centroid")).as("__cells"),
        transform(byCell, x => x("cell")).as("__ids")))
    val nc = graft.functions.PqExprs.nearestCell(col("__v"), col("__cells"))
    val members = vectors
      .select(toDouble(col(vecCol)).as("__v"))
      .join(packed)
      .select(element_at(col("__ids"), nc.getField("cell") + 1).as("cell"),
        col("__v"))
    val means = members
      .select(col("cell"), posexplode(col("__v")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(floor(col("v") * lit(1e9)).cast("long")).cast("double") /
        (count(lit(1)) * lit(1e9))).as("mean"))
    val rebuilt = means
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
        x => x("mean")).as("__new"))
    centroids.join(rebuilt, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("__new"), col("centroid")).as("centroid"))
  }

  /** Checkpoint cadence for iterative trainers (the GraphX
    * checkpointInterval shape). 1 = eager localCheckpoint every round.
    * MEASURED (sf0.1, paired benches): batching rounds (interval 4) was
    * consistently 10-20% SLOWER than per-round checkpoints across the
    * whole k-means family — un-checkpointed rounds nest the previous
    * round's broadcast subtree into the next plan, and the extra
    * planning/AQE work costs more than the skipped centroid-sized jobs.
    * Per-round checkpointing stays the default; the knob and
    * [[maybeCheckpoint]] remain so a long training (tens of rounds over a
    * corpus-scale sample) can trade plan-prep cost against job count
    * deliberately. Values are identical either way — checkpointing never
    * changes numbers, only lineage. */
  val CheckpointInterval = 1

  private[operators] def maybeCheckpoint(df: DataFrame, round: Int,
                                         iters: Int): DataFrame =
    if (round == iters || round % CheckpointInterval == 0)
      df.localCheckpoint(true)
    else df

  /** Train: `iters` Lloyd rounds from the deterministic seed. Output
    * (cell, centroid) — feed to [[assign]] for the final clustering or to
    * an IVF index as its coarse quantizer. */
  def fit(vectors: DataFrame, k: Int, iters: Int = 3,
          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, s"iters=$iters")
    var cents = initCentroids(vectors, k, idCol, vecCol)
    for (i <- 1 to iters)
      cents = maybeCheckpoint(lloyd(vectors, cents, idCol, vecCol), i, iters)
    cents
  }

  /** One representative per cluster: the member NEAREST its cell's
    * centroid (ties to the lowest id), with the cell's member count —
    * the coreset/diversity-selection view of a fitted clustering (pick
    * one exemplar per semantic neighborhood; the SemDedup-era companion
    * to pruning: where [[SemDedup.prune]] drops redundant members, this
    * names the member that STANDS FOR the cluster).
    *
    * Output: (cell, representative_id, rep_dist, n_members) — one row
    * per cell that has members. rep_dist is the squared distance (the
    * [[assign]] in-row fold, index-order — engine-exact).
    *
    * Scale shape: [[assign]]'s broadcast argmin projection + ONE
    * cell-keyed window (both the rank and the member count ride the
    * same partitioning — one exchange), cells-sized output. */
  def representatives(vectors: DataFrame, centroids: DataFrame,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCell = Window.partitionBy(col("cell"))
    val w = byCell.orderBy(col("dist"), col("vec_id"))
    assign(vectors, centroids, idCol, vecCol)
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(byCell))
      .filter(col("__rn") === 1)
      .select(col("cell"), col("vec_id").as("representative_id"),
        col("dist").as("rep_dist"), col("n_members"))
  }

  /** One Lloyd round over MANY independent trainings at once: `vectors`
    * carries a group key (e.g. a PQ subspace id) and `centroids` is
    * (group, cell, centroid). Every aggregation below is keyed by the
    * group, so each group's trajectory is bit-identical to running
    * [[lloyd]] on its slice alone — but all groups share ONE broadcast,
    * ONE assignment pass and ONE mean aggregation per round instead of a
    * job chain per group ([[ProductQuantization.fit]] runs m=8+ subspace
    * trainings as one loop this way). */
  def lloydKeyed(vectors: DataFrame, centroids: DataFrame,
                 groupCol: String = "subspace", idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    // per-group packed centroids + in-row argmin (see [[lloyd]]): one
    // broadcast row PER GROUP, the group equi-join replaces the
    // vectors × cells blowup, and the per-(group, vec) min aggregation
    // disappears. Groups may carry different dimensionalities (the
    // IVF-PQ joint fit's coarse group rides full-width rows) — each row
    // scans only its own group's cell list.
    val byCell = array_sort(collect_list(struct(col("cell"), col("centroid"))))
    val packed = broadcast(centroids.groupBy(col(groupCol))
      .agg(transform(byCell, x => x("centroid")).as("__cells"),
        transform(byCell, x => x("cell")).as("__ids")))
    val nc = graft.functions.PqExprs.nearestCell(col("__v"), col("__cells"))
    val members = vectors
      .select(col(groupCol), toDouble(col(vecCol)).as("__v"))
      .join(packed, Seq(groupCol))
      .select(col(groupCol),
        element_at(col("__ids"), nc.getField("cell") + 1).as("cell"),
        col("__v"))
    val means = members
      .select(col(groupCol), col("cell"), posexplode(col("__v")).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("cell"), col("pos"))
      .agg((sum(floor(col("v") * lit(1e9)).cast("long")).cast("double") /
        (count(lit(1)) * lit(1e9))).as("mean"))
    val rebuilt = means
      .groupBy(col(groupCol), col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
        x => x("mean")).as("__new"))
    centroids.join(rebuilt, Seq(groupCol, "cell"), "left")
      .select(col(groupCol), col("cell"),
        coalesce(col("__new"), col("centroid")).as("centroid"))
  }
}
