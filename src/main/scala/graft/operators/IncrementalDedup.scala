package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.GraftColumnBridge

/** Incremental deduplication against an already-ingested history — the
  * "don't re-admit what the corpus already holds" gate a continuously
  * growing training corpus runs on every ingest batch. (The batch dedup
  * family in [[Dedup]] dedups WITHIN a corpus; this dedups a new batch
  * AGAINST 100 TB of prior corpus without touching it per batch.)
  *
  * The exact formulation is an anti-join on content digests, which
  * re-shuffles the history's digest set for every incoming batch. The scale
  * path sketches the history ONCE into a fixed-size Bloom filter
  * (`spark.util.sketch.BloomFilter`, built distributed by
  * `df.stat.bloomFilter`), and batches stream past the sketch with ZERO
  * shuffle: membership is a codegen'd [[BloomFilterMightContain]] over a
  * plan-literal byte array — the same machinery Spark's runtime row-level
  * filtering injects, reused deliberately rather than reimplemented.
  *
  * Bloom guarantees map onto dedup semantics asymmetrically:
  *  - NO false negatives: a document whose digest is in the history is
  *    ALWAYS flagged — a dup can never be re-admitted by any tier here.
  *  - False positives at rate `fpp`: [[filterUnseen]] (sketch-only) drops
  *    ~fpp of genuinely-new documents — usually the right trade for
  *    training data (data is plentiful, dup contamination is costly).
  *    [[filterUnseenExact]] restores exactness by confirming ONLY the
  *    flagged sliver (~fpp of the batch + true dups) against the history
  *    with an anti-join, so the exact tier's join probe side is tiny.
  *
  * Sketch sizing: ~1.2 bytes/item at fpp=1% — 100M digests ≈ 120 MB, a
  * reasonable broadcast/plan literal; beyond that shard the history (one
  * sketch per shard, OR the flags) or drop to the plain anti-join.
  */
object IncrementalDedup {

  /** Build the history's digest sketch: one distributed pass over
    * `history`, driver gets back only the fixed-size bits. This RUNS a
    * Spark action; build once per ingest epoch and reuse across batches.
    * Keys are hashed to 64-bit longs first (`xxhash64`), so the sketch
    * stores uniform longs regardless of key type. */
  def sketch(history: DataFrame, keyCol: String,
             expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bf = history.select(xxhash64(col(keyCol)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Codegen'd membership probe: true iff `key`'s digest MIGHT be in the
    * sketched history (false ⇒ definitely unseen). */
  def mightBeSeen(sketchBytes: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(sketchBytes, BinaryType),
      GraftColumnBridge.expression(xxhash64(key))))

  /** Sketch-only gate — THE per-batch scale path: keeps rows definitely
    * not in the history. Zero shuffle, zero history access; over-drops
    * ~fpp of new rows (and never under-drops a dup). */
  def filterUnseen(batch: DataFrame, sketchBytes: Array[Byte],
                   keyCol: String): DataFrame =
    batch.filter(!mightBeSeen(sketchBytes, col(keyCol)))

  /** Exact two-tier gate: result is EXACTLY `batch` minus rows whose key
    * exists in `history` (same rows as the plain anti-join — the
    * correctness invariant the oracle gate checks). The sketch prunes the
    * probe side first: unflagged rows pass without ever joining; only the
    * flagged sliver (true dups + ~fpp false positives) is confirmed
    * against history's distinct keys. */
  def filterUnseenExact(batch: DataFrame, history: DataFrame,
                        keyCol: String, sketchBytes: Array[Byte]): DataFrame = {
    val seen = mightBeSeen(sketchBytes, col(keyCol))
    val confirmedNew = batch.filter(seen)
      .join(history.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    batch.filter(!seen).unionByName(confirmedNew)
  }
}
