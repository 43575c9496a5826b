package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextTiling-shaped topic segmentation (Hearst 1997) — the long-document
  * splitter a chunking pipeline wants when fixed-stride windows
  * ([[Packing.chunkDocuments]]) would cut mid-topic: score every gap
  * between adjacent fixed-size token blocks by how much vocabulary the
  * two sides share, then mark the locally deepest valleys as topic
  * boundaries. RAG indexers and long-context curricula split there.
  *
  * Deviations from Hearst, chosen so every quantity is ENGINE-EXACT
  * integer math (the oracle-parity discipline) and every stage is
  * doc-keyed (the 100 TB shape):
  *  - gap score = HISTOGRAM INTERSECTION of the two adjacent blocks'
  *    term-count vectors (Σ_t min(cnt_left, cnt_right) — integer mass of
  *    shared vocabulary) instead of IEEE cosine;
  *  - the sequential "climb while increasing" peak search becomes a
  *    WINDOWED peak: depth(g) = (max score over the `peakWindow` gaps
  *    left of g − s_g) + (same to the right) — two frame-bounded window
  *    maxes instead of an order-dependent walk;
  *  - the boundary cutoff is the per-document MEAN depth (strict
  *    integer comparison depth·n_gaps > Σdepth — Hearst's μ−σ/2 needs a
  *    sqrt; the mean is the deterministic member of that family).
  *
  * Scale shape: tokens explode once; block-term counts are one
  * (doc, block, token) aggregation with map-side combine; adjacent-block
  * similarity is ONE self-equi-join on (doc, token, block+1); depth =
  * two windows over the per-doc GAP frame (gaps = tokens/blockTokens —
  * tiny next to the corpus); the cutoff join is a doc-keyed aggregate
  * joined back. Nothing is corpus-global.
  */
object TopicTiling {

  /** Per-gap segmentation scores. Output one row per gap g ∈ [1,
    * numBlocks): (doc_id, gap_idx, sim, depth, boundary) — gap g sits
    * between block g−1 and block g at token offset g·blockTokens; `sim`
    * is the shared-vocabulary mass, `depth` the summed valley depth
    * against the windowed peaks, `boundary` whether depth strictly
    * exceeds the document's mean gap depth. Documents shorter than two
    * blocks emit nothing (no gap to score). The trailing partial block
    * participates (its counts are simply smaller — min() handles the
    * asymmetry). */
  def gapScores(docs: DataFrame, blockTokens: Int = 8, peakWindow: Int = 2,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(blockTokens >= 1, s"blockTokens=$blockTokens")
    require(peakWindow >= 1, s"peakWindow=$peakWindow")
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("__pos", "__tok")))
      .select(col("doc_id"),
        expr(s"__pos div $blockTokens").cast("long").as("__blk"),
        col("__tok"))
    val blockTerms = toks.groupBy(col("doc_id"), col("__blk"), col("__tok"))
      .agg(count(lit(1)).as("__cnt"))
    val left = blockTerms.select(col("doc_id"),
      (col("__blk") + 1L).as("gap_idx"), col("__tok"),
      col("__cnt").as("__cl"))
    val right = blockTerms.select(col("doc_id"), col("__blk").as("gap_idx"),
      col("__tok"), col("__cnt").as("__cr"))
    // inner join: a term missing on either side contributes min(...) = 0
    val sims = left.join(right, Seq("doc_id", "gap_idx", "__tok"))
      .groupBy(col("doc_id"), col("gap_idx"))
      .agg(sum(least(col("__cl"), col("__cr"))).as("sim"))
    // gaps whose adjacent blocks share NO term drop out of the inner
    // join — restore them at sim 0 from the block frame (every block
    // boundary is a gap)
    val allGaps = blockTerms.select(col("doc_id"), col("__blk")).distinct()
      .filter(col("__blk") > 0)
      .select(col("doc_id"), col("__blk").as("gap_idx"))
    val scored = allGaps.join(sims, Seq("doc_id", "gap_idx"), "left")
      .select(col("doc_id"), col("gap_idx"),
        coalesce(col("sim"), lit(0L)).as("sim"))
    val wl = Window.partitionBy(col("doc_id")).orderBy(col("gap_idx"))
      .rowsBetween(-peakWindow, 0)
    val wr = Window.partitionBy(col("doc_id")).orderBy(col("gap_idx"))
      .rowsBetween(0, peakWindow)
    val depths = scored
      .withColumn("depth",
        (max(col("sim")).over(wl) - col("sim")) +
          (max(col("sim")).over(wr) - col("sim")))
    val stats = depths.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__n"), sum(col("depth")).as("__sum"))
    depths.join(stats, Seq("doc_id"))
      .select(col("doc_id"), col("gap_idx"), col("sim"), col("depth"),
        (col("depth") * col("__n") > col("__sum")).as("boundary"))
  }

  /** Segment assignment: each token block labeled with its topic segment
    * (0-based, segments open at boundary gaps). One cumulative window
    * over the per-doc block frame — the consumer-facing view a chunker
    * joins on. */
  def segments(docs: DataFrame, blockTokens: Int = 8, peakWindow: Int = 2,
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val gaps = gapScores(docs, blockTokens, peakWindow, idCol, textCol)
      .filter(col("boundary"))
      .select(col("doc_id"), col("gap_idx"), lit(1L).as("__cut"))
    val blocks = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__nt"))
      .filter(col("__nt") > 0)
      .select(col("doc_id"), explode(sequence(lit(0L),
        expr(s"(__nt - 1) div $blockTokens"))).as("__blk"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blocks.join(gaps, blocks("doc_id") === gaps("doc_id") &&
        blocks("__blk") === gaps("gap_idx"), "left")
      .select(blocks("doc_id"), col("__blk"),
        coalesce(col("__cut"), lit(0L)).as("__c"))
      .withColumn("segment", sum(col("__c")).over(w))
      .select(col("doc_id"), col("__blk").as("block"), col("segment"))
  }
}
