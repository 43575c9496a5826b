package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus embeddings
  * with k-means, then inside each cluster drop every vector that is
  * near-duplicate (cosine ≥ threshold) of a canonical keeper. Unlike the
  * token-level detectors ([[Dedup.jaccardPairs]], [[Dedup.minhashLshPairs]])
  * this catches SEMANTIC duplicates — paraphrases, templated rewrites,
  * translations embedded nearby — that share few surface n-grams.
  *
  * Determinism contract: clustering is [[KMeans.fit]] (deterministic seed,
  * fixed-point means, fixed iteration budget), and the prune rule is
  * id-ordered — a vector is dropped iff SOME lower-id vector in its cell is
  * within the threshold. That one-pass pairwise rule is the
  * parallel-friendly variant of the paper's keep-one-exemplar loop: it
  * needs no sequential scan over the cluster, makes the kept set a pure
  * function of (embeddings, k, iters, threshold), and keeps at least one
  * member of every near-dup neighborhood (the lowest id has no lower-id
  * neighbor). A chained greedy ("drop only if similar to a SURVIVOR")
  * differs only when a dropped vector bridges two survivors just outside
  * the threshold — at dedup thresholds (≥ 0.9 in the paper; lower here so
  * the synthetic corpus exercises the path) the sets rarely differ, and the
  * pairwise rule errs toward dropping more, the conservative direction for
  * training-data curation.
  *
  * Scale shape (100 TB): this is exactly the paper's design point — the
  * quadratic pair space is bounded by CLUSTER, not corpus: cost is
  * Σ|cell|², so k is chosen to hold E[|cell|] = N/k at a few thousand and
  * the whole prune is one equi-join on the cell key (the
  * [[Similarity.embeddingDupPairs]] shape) plus an id-only anti-join.
  * Nothing corpus-sized crosses the driver; the k×dim centroid table
  * broadcasts. Skewed cells (a degenerate cluster) are the k-means
  * trainer's failure mode, not this join's — re-train with larger k or
  * split hot cells by a hash sub-key before pairing (the
  * [[Dedup.minhashLshPairs]] `maxBucketSize` discipline applies verbatim
  * if a hard cap is ever needed).
  */
object SemDedup {

  /** Cluster + prune: one row per input vector — (vec_id, cell, kept).
    * `kept = 0` iff a lower-id vector in the same k-means cell has cosine
    * similarity ≥ `threshold`. Feed `kept = 1` ids to
    * [[Dedup.applyKeepList]]-style anti-joins to scrub the corpus. */
  def prune(vectors: DataFrame, k: Int, iters: Int, threshold: Double,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val asg = KMeans.assign(vectors, KMeans.fit(vectors, k, iters, idCol, vecCol),
        idCol, vecCol)
      .select(col("vec_id"), col("cell"))
    val withCell = vectors.select(col(idCol).as("vec_id"), col(vecCol))
      .join(asg, Seq("vec_id"))
    val dropped = Similarity
      .embeddingDupPairs(withCell, threshold, blockCol = "cell",
        idCol = "vec_id", vecCol = vecCol)
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("__drop", lit(1))
    asg.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("__drop").isNotNull, lit(0)).otherwise(lit(1)).as("kept"))
  }
}
