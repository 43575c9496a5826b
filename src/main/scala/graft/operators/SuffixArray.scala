package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix array over a tokenized corpus — the data structure
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better") build their ExactSubstr dedup on, constructed the way a
  * shuffle engine should: PREFIX DOUBLING (Manber & Myers 1990; the
  * distributed formulation follows Flick & Sundar 2015, "Parallel
  * distributed memory construction of suffix and LCP arrays", SC'15).
  * [[SubstringDedup]] is the fixed-k approximation of the same paper;
  * this operator is the exact-resolution twin: it knows the FULL length
  * of every repeat, not just "≥ k", so it also answers "what is the
  * longest duplicated passage in the corpus?" — the audit question a
  * contamination investigation starts with.
  *
  * Suffixes never cross document boundaries (each document is implicitly
  * terminated), but ranks are GLOBAL — the array interleaves suffixes of
  * every document, which is exactly what makes cross-document repeats
  * adjacent. Order is token-wise lexicographic (token = whitespace word,
  * compared as a whole string), with a shorter suffix sorting before any
  * suffix it prefixes.
  *
  * Algorithm, each round one shuffle pair:
  *  - round 0: rank₁ = global dense rank of the single token;
  *  - round i: rank₂ₖ(p) = global dense rank of (rankₖ(p), rankₖ(p+k)),
  *    missing partner → 0 (sorts first — the shorter-suffix rule);
  *  - after log₂(maxPrefix) rounds ranks order suffixes by their first
  *    maxPrefix tokens; with maxPrefix ≥ the longest document they are
  *    the exact suffix ranks (dense: identical suffixes share a rank).
  *
  * Global dense ranking is the TWO-PHASE range shape ([[globalDenseRank]]):
  * range-repartition on the keys, per-partition dense_rank, plus
  * partition offsets from a partition-count-sized aggregate — no global
  * single-task window anywhere. Every round ends in an eager checkpoint
  * (the BSP lineage discipline); intermediate rank tables are RETAINED —
  * they are exactly the binary-lifting tables that answer LCP queries in
  * log rounds ([[lcpAdjacent]]), the same reuse Flick & Sundar make.
  *
  * Scale shape (100 TB): every frame is (doc_id, pos)-keyed and
  * corpus-token-sized; each round is two hash joins + one range exchange.
  * Rounds are log₂ of the LONGEST DOCUMENT (not the corpus): 4096-token
  * documents cost 12 rounds regardless of corpus size. The LCP descent
  * joins are all (doc_id, pos) equi-joins over the adjacent-pair frame.
  */
object SuffixArray {

  /** Rank tables by doubling level (k → (doc_id, pos, rank)), the final
    * suffix array frame (`sa`, level maxPrefix), per-doc token lengths,
    * and the (doc_id, pos, token) frame that built them. */
  final case class Model(levels: Seq[(Int, DataFrame)], sa: DataFrame,
                         lens: DataFrame, toks: DataFrame)

  /** Global dense rank of `df` rows by `keys`, appended as column `out`
    * (long, 1-based; equal keys share a rank).
    *
    * Two-phase: range-repartition on the keys (equal keys land in one
    * partition, partitions are ordered and disjoint), per-partition
    * dense_rank windows, then global rank = local rank + the count of
    * distinct keys in earlier partitions. The offsets frame has one row
    * per shuffle partition — its ordering window is bounded by the
    * partition count, never the data. The partitioned frame is
    * checkpointed eagerly so both consumers (ranking window, offset
    * aggregate) see ONE materialization: partition ids must not be
    * re-drawn between them. Output ranks are a pure function of the data
    * (local rank + distinct-count offsets are invariant to where the
    * range boundaries fall). */
  def globalDenseRank(df: DataFrame, keys: Seq[String],
                      out: String): DataFrame = {
    require(keys.nonEmpty, "globalDenseRank: no keys")
    val keyCols = keys.map(col)
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val mat = df.repartitionByRange(n, keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val w = Window.partitionBy(col("__pid")).orderBy(keyCols: _*)
    val local = mat.withColumn("__lr", dense_rank().over(w).cast("long"))
    val cnts = mat.groupBy(col("__pid"))
      .agg(countDistinct(struct(keyCols: _*)).as("__nd"))
    val wo = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts
      .withColumn("__off", coalesce(sum(col("__nd")).over(wo), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offs), Seq("__pid"))
      .withColumn(out, col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
  }

  /** Build the suffix array (and its doubling rank tables) over the
    * corpus. `maxPrefix` (a power of two ≥ the longest document's token
    * count) bounds the compared prefix: ranks are exact suffix ranks for
    * documents up to maxPrefix tokens, and longer documents compare by
    * their first maxPrefix tokens (callers chunk or raise the budget —
    * rounds grow as log₂, so 4096 costs 12). */
  def fit(docs: DataFrame, maxPrefix: Int, idCol: String = "doc_id",
          textCol: String = "text"): Model = {
    require(maxPrefix >= 1 && (maxPrefix & (maxPrefix - 1)) == 0,
      s"maxPrefix=$maxPrefix must be a power of two")
    val toks = docs
      .select(col(idCol).as("doc_id"), posexplode(
        graft.functions.WordShingles.allShingles(col(textCol), 1)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("token"))
      .localCheckpoint(true)
    val lens = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("len")).localCheckpoint(true)
    var cur = globalDenseRank(toks, Seq("token"), "rank")
      .select(col("doc_id"), col("pos"), col("rank"))
      .localCheckpoint(true)
    var levels = Seq(1 -> cur)
    var k = 1
    while (k < maxPrefix) {
      val partner = cur.select(col("doc_id"),
        (col("pos") - k).as("pos"), col("rank").as("__r2"))
      val paired = cur.join(partner, Seq("doc_id", "pos"), "left")
        .withColumn("__r2", coalesce(col("__r2"), lit(0L)))
      cur = globalDenseRank(paired, Seq("rank", "__r2"), "__nr")
        .select(col("doc_id"), col("pos"), col("__nr").as("rank"))
        .localCheckpoint(true)
      k *= 2
      levels :+= k -> cur
    }
    Model(levels, cur, lens, toks)
  }

  /** One row per ADJACENT pair in the suffix array's total order (ranks,
    * ties broken by (doc_id, pos)): (d1, p1, d2, p2, sa_idx, lcp) with
    * lcp = the exact length of the pair's common token prefix.
    *
    * LCP runs as binary descent over the retained rank tables, all pairs
    * at once: from the highest doubling level down, if both suffixes'
    * ranks at offset `acc` agree at level k, the first k·tokens match —
    * advance acc by k. A level's rank row is absent past the document
    * end, which correctly reads as "no match". Full ties overshoot by
    * construction (level sums exceed the remainder), so the final lcp
    * clamps to both suffixes' remaining lengths. One (doc_id, pos)-keyed
    * join pair per level, checkpointed — log₂(maxPrefix) rounds. */
  def lcpAdjacent(model: Model): DataFrame = {
    val idx = globalDenseRank(model.sa, Seq("rank", "doc_id", "pos"),
        "sa_idx")
      .select(col("doc_id"), col("pos"), col("sa_idx"))
      .localCheckpoint(true)
    val right = idx.select((col("sa_idx") - 1).as("sa_idx"),
      col("doc_id").as("d2"), col("pos").as("p2"))
    var pairs = idx
      .select(col("sa_idx"), col("doc_id").as("d1"), col("pos").as("p1"))
      .join(right, Seq("sa_idx"))
      .withColumn("__acc", lit(0L))
    model.levels.sortBy(-_._1).foreach { case (k, rk) =>
      val a = rk.select(col("doc_id").as("d1"), col("pos").as("__qa"),
        col("rank").as("__ra"))
      val b = rk.select(col("doc_id").as("d2"), col("pos").as("__qb"),
        col("rank").as("__rb"))
      pairs = pairs
        .withColumn("__qa", col("p1") + col("__acc"))
        .withColumn("__qb", col("p2") + col("__acc"))
        .join(a, Seq("d1", "__qa"), "left")
        .join(b, Seq("d2", "__qb"), "left")
        .withColumn("__acc",
          when(col("__ra").isNotNull && col("__ra") === col("__rb"),
            col("__acc") + k).otherwise(col("__acc")))
        .drop("__qa", "__qb", "__ra", "__rb")
        .localCheckpoint(true)
    }
    val l1 = model.lens.select(col("doc_id").as("d1"), col("len").as("__l1"))
    val l2 = model.lens.select(col("doc_id").as("d2"), col("len").as("__l2"))
    pairs.join(l1, Seq("d1")).join(l2, Seq("d2"))
      .select(col("d1"), col("p1"), col("d2"), col("p2"), col("sa_idx"),
        least(col("__acc"), col("__l1") - col("p1"),
          col("__l2") - col("p2")).as("lcp"))
  }

  /** The corpus's longest duplicated passages: top-k adjacent-pair LCPs
    * (the maximum LCP anywhere is always realized by an adjacent pair),
    * with the repeated token prefix spelled out. Deterministic order:
    * (lcp desc, d1, p1, d2, p2). The text join touches only the k winner
    * rows (broadcast), never the corpus. */
  def longestDuplicated(model: Model, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK=$topK")
    val winners = lcpAdjacent(model)
      .filter(col("lcp") >= 1)
      .orderBy(col("lcp").desc, col("d1"), col("p1"), col("d2"), col("p2"))
      .limit(topK)
      .select(col("lcp"), col("d1"), col("p1"), col("d2"), col("p2"))
      .localCheckpoint(true)
    model.toks
      .join(broadcast(winners), model.toks("doc_id") === winners("d1") &&
        col("pos") >= col("p1") && col("pos") < col("p1") + col("lcp"))
      .groupBy(col("lcp"), col("d1"), col("p1"), col("d2"), col("p2"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("token")))),
        x => x.getField("token")), " ").as("gram"))
  }

  /** ExactSubstr duplicated spans from the suffix array: a position
    * starts a duplicated run of ≥ minLen tokens iff its LCP with an SA
    * NEIGHBOR reaches minLen (suffixes sharing an L-prefix form a
    * contiguous SA block, so every member of a ≥2 block sees one
    * neighbor inside it); marked starts merge per document exactly like
    * [[SubstringDedup.duplicatedSpans]] — by construction the two paths
    * produce IDENTICAL spans on the same corpus (equivalence is
    * spec-pinned and oracle-gated against the k-gram oracle). */
  def duplicatedSpans(model: Model, minLen: Int): DataFrame = {
    require(minLen >= 1, s"minLen=$minLen")
    val adj = lcpAdjacent(model).filter(col("lcp") >= minLen)
    val hits = adj.select(col("d1").as("doc_id"), col("p1").as("pos"))
      .unionByName(adj.select(col("d2").as("doc_id"), col("p2").as("pos")))
    SubstringDedup.mergeStartPositions(hits, minLen)
  }
}
