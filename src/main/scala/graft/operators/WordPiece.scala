package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WordPiece vocabulary learning (Schuster & Nakajima 2012 —
  * the BERT tokenizer's trainer), completing the engine's subword-trainer
  * family: BPE ([[BpeLearn]], count argmax), unigram-LM ([[UnigramLm]],
  * EM pruning) and WordPiece (likelihood argmax) are the three trainers
  * behind every mainstream LLM tokenizer.
  *
  * WordPiece differs from BPE only in the SELECTION rule: instead of the
  * most frequent adjacent pair, each round merges the pair maximizing
  *
  *   score(l, r) = count(l, r) / (count(l) · count(r))
  *
  * — the pointwise likelihood gain of fusing the pair under a unigram
  * corpus model. Everything else reuses the BPE machinery: the state the
  * loop iterates on is the VOCABULARY-SIZED word-frequency table (the
  * corpus collapses once through [[BpeLearn.wordFrequencies]]), each
  * round is one pair-count aggregation + one symbol-count aggregation +
  * two broadcast joins, and re-segmentation runs the native codegen'd
  * [[graft.functions.ApplyMerges]] kernel. Only the winning pair crosses
  * the driver — O(1) rows per merge at any corpus size.
  *
  * Piece convention (BERT's): the first piece of a word is bare,
  * continuation pieces carry the `##` prefix. Internally a merged symbol
  * keeps its constituents' markers verbatim (`a`+`##b` → `a##b`) so the
  * concat-only merge kernel applies unchanged; [[display]] maps the
  * internal form to the standard emitted form (`a##b` → `ab`,
  * `##a##b` → `##ab`) — a bijection for any corpus whose words don't
  * START with the literal `#` (see [[display]]'s precondition; the
  * degeneracy is the `##` convention's own, shared with BERT).
  *
  * Determinism contract (the oracle-parity discipline): counts are exact
  * longs; the score is ONE correctly-rounded IEEE division of two exact
  * long→double conversions and one double multiply — bit-identical in
  * any engine — and ties break lexicographically on (left, right), so
  * the merge sequence is a pure function of the corpus.
  */
object WordPiece {

  /** One learned merge: rank = order learned, `left`/`right` are the
    * INTERNAL marker-carrying symbols, `merged` the display form;
    * `weight` = exact pair count, `left_cnt`/`right_cnt` the symbol
    * counts the score divided by (kept integral so the gate output
    * carries no floats). */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, weight: Long,
                         left_cnt: Long, right_cnt: Long)

  /** Internal → emitted symbol form: strip constituent-boundary `##`
    * markers, keeping only a word-initial continuation marker.
    *
    * PRECONDITION (shared with BERT's own vocabulary format): corpus
    * words must not START with the literal character `#` — a
    * word-initial symbol over such a word ("#a" → internal "###a")
    * starts with the marker and is indistinguishable from a
    * continuation form, so it would serve from the continuation trie
    * only. This is the `##`-prefix convention's inherent degeneracy,
    * not an implementation artifact; a corpus with #-initial words
    * should strip or escape them upstream (spec-characterized). */
  def display(sym: String): String =
    if (sym.startsWith("##")) "##" + sym.drop(2).replace("##", "")
    else sym.replace("##", "")

  /** Initial segmentation: first character bare, continuations
    * `##`-prefixed (no end-of-word marker — WordPiece marks word starts,
    * not ends). */
  private def initialPieces(word: Column): Column =
    transform(sequence(lit(1), length(word)),
      i => when(i === lit(1), word.substr(i, lit(1)))
        .otherwise(concat(lit("##"), word.substr(i, lit(1)))))

  /** Learn `numMerges` merges. Stops early when no pair reaches
    * `minFrequency` (the floor applies to the pair COUNT, not the score —
    * a rare pair of rarer symbols can have a huge score but generalizes
    * to nothing). */
  def learn(corpus: DataFrame, numMerges: Int, textCol: String = "text",
            minFrequency: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges=$numMerges")
    val words = BpeLearn.wordFrequencies(corpus, textCol)
    var st = words
      .select(col("cnt"), initialPieces(col("word")).as("pieces"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pairs = st
        .select(col("cnt"), explode(
          when(size(col("pieces")) >= 2,
            transform(sequence(lit(1), size(col("pieces")) - 1),
              i => struct(element_at(col("pieces"), i).as("l"),
                element_at(col("pieces"), i + 1).as("r"))))
            .otherwise(array().cast(
              "array<struct<l:string,r:string>>"))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("cnt")).as("w"))
      // symbol counts — vocabulary-scale, broadcast to the pair frame.
      // Materialized once per round: the cl and cr joins below would
      // otherwise each re-run this aggregation over the word table
      // (structurally-distinct broadcast subtrees defeat exchange reuse
      // — the documented gotcha), doubling per-round work
      val syms = st
        .select(col("cnt"), explode(col("pieces")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("cnt")).as("c"))
        .localCheckpoint(true)
      val best = pairs
        .join(broadcast(syms.select(col("sym").as("l"), col("c").as("cl"))),
          Seq("l"))
        .join(broadcast(syms.select(col("sym").as("r"), col("c").as("cr"))),
          Seq("r"))
        .filter(col("w") >= minFrequency)
        .select(col("l"), col("r"), col("w"), col("cl"), col("cr"),
          (col("w").cast("double") /
            (col("cl").cast("double") * col("cr").cast("double")))
            .as("score"))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      best.headOption match {
        case Some(row) =>
          val (l, r) = (row.getString(0), row.getString(1))
          merges += Merge(rank, l, r, display(l + r), row.getLong(2),
            row.getLong(3), row.getLong(4))
          st = st.select(col("cnt"),
            graft.functions.ApplyMerges(col("pieces"), Seq((l, r)))
              .as("pieces")).localCheckpoint(true)
          rank += 1
        case _ => exhausted = true
      }
    }
    merges.result()
  }

  /** [[learn]]'s batched production shape (mirroring
    * [[BpeLearn.learnBatched]] — r12 left WordPiece one-merge-per-round,
    * the exact shape that made 30k-merge BPE builds impractical before
    * batching; a 30k WordPiece vocabulary is the real BERT setting): per
    * round, rank candidates by the likelihood score, greedily accept up
    * to `batchSize` pairwise SYMBOL-DISJOINT pairs, apply the whole
    * batch in one [[graft.functions.ApplyMerges]] re-segmentation pass —
    * driver round-trips and checkpoints drop from numMerges to
    * ~numMerges/batchSize.
    *
    * The disjointness argument is STRONGER here than for BPE: merging
    * (a,b) changes only the counts of a, b and the minted symbol, so a
    * disjoint pair's w, cl and cr — hence its score — are EXACTLY
    * invariant under the rest of the batch; the only divergence from
    * strict sequential order is that a mid-batch minted symbol could
    * have out-scored a later batch member (the same large-vocab trade
    * BPE's batching accepts). At `batchSize = 1` the selection
    * degenerates to [[learn]]'s argmax and the result is IDENTICAL
    * (spec-checked). Deterministic for any batchSize: candidate order is
    * (score desc, left, right) — the score ONE correctly-rounded IEEE
    * division of exact counts — and the greedy scan is a pure function
    * of it.
    *
    * Candidate headroom is adaptive exactly like BPE's (see
    * [[BpeLearn.learnBatched]]): start at 3× the want, double when a
    * FULL list exhausts before filling, re-center on the observed
    * scan-to-fill ratio when it fills. Rounds that fill within the
    * first 3× candidates are ask-invariant, so the oracle gates stay
    * multiplier-free. */
  def learnBatched(corpus: DataFrame, numMerges: Int, batchSize: Int,
                   textCol: String = "text", minFrequency: Long = 2L,
                   onRound: (Int, Int, Int) => Unit = (_, _, _) => ())
      : Seq[Merge] = {
    require(numMerges >= 1, s"numMerges=$numMerges")
    require(batchSize >= 1, s"batchSize=$batchSize")
    val words = BpeLearn.wordFrequencies(corpus, textCol)
    var st = words
      .select(col("cnt"), initialPieces(col("word")).as("pieces"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    val MaxAsk = 500000
    var mult = 3.0
    while (rank < numMerges && !exhausted) {
      val want = math.min(numMerges - rank, batchSize)
      val ask = math.min(MaxAsk.toDouble,
        math.max(want * 3.0, want * mult)).toInt
      val pairs = st
        .select(col("cnt"), explode(
          when(size(col("pieces")) >= 2,
            transform(sequence(lit(1), size(col("pieces")) - 1),
              i => struct(element_at(col("pieces"), i).as("l"),
                element_at(col("pieces"), i + 1).as("r"))))
            .otherwise(array().cast(
              "array<struct<l:string,r:string>>"))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("cnt")).as("w"))
      // one symbol-count materialization per round (two broadcast joins
      // below — structurally-distinct broadcast subtrees defeat exchange
      // reuse, the documented gotcha)
      val syms = st
        .select(col("cnt"), explode(col("pieces")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("cnt")).as("c"))
        .localCheckpoint(true)
      val top = pairs
        .join(broadcast(syms.select(col("sym").as("l"), col("c").as("cl"))),
          Seq("l"))
        .join(broadcast(syms.select(col("sym").as("r"), col("c").as("cr"))),
          Seq("r"))
        .filter(col("w") >= minFrequency)
        .select(col("l"), col("r"), col("w"), col("cl"), col("cr"),
          (col("w").cast("double") /
            (col("cl").cast("double") * col("cr").cast("double")))
            .as("score"))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .limit(ask)
        .collect()
      val used = scala.collection.mutable.Set.empty[String]
      val batch = Seq.newBuilder[(String, String, Long, Long, Long)]
      var n = 0
      var scanned = 0
      top.iterator.foreach { row =>
        val (l, r) = (row.getString(0), row.getString(1))
        if (n < want) {
          scanned += 1
          if (!used(l) && !used(r)) {
            batch += ((l, r, row.getLong(2), row.getLong(3), row.getLong(4)))
            used += l; used += r; n += 1
          }
        }
      }
      val accepted = batch.result()
      // retune (the BPE discipline): every collected candidate already
      // passed the frequency floor (filtered pre-rank here), so a FULL
      // list that under-fills always justifies growing the ask
      if (accepted.length < want) {
        if (top.length == ask && ask < MaxAsk)
          mult = math.min(mult * 2.0, MaxAsk.toDouble / math.max(1, want))
      } else {
        mult = math.max(3.0, 1.5 * scanned.toDouble / want)
      }
      onRound(rank, want, accepted.length)
      if (accepted.isEmpty) exhausted = true
      else {
        accepted.foreach { case (l, r, w, cl, cr) =>
          merges += Merge(rank, l, r, display(l + r), w, cl, cr); rank += 1
        }
        st = st.select(col("cnt"),
          graft.functions.ApplyMerges(col("pieces"),
            accepted.map { case (l, r, _, _, _) => (l, r) }).as("pieces"))
          .localCheckpoint(true)
      }
    }
    merges.result()
  }

  /** The learned merge table as a DataFrame — the persistable artifact
    * and the gate surface (rank, left, right, merged, weight, left_cnt,
    * right_cnt). */
  def learnTable(spark: SparkSession, corpus: DataFrame, numMerges: Int,
                 textCol: String = "text",
                 minFrequency: Long = 2L): DataFrame = {
    import spark.implicits._
    learn(corpus, numMerges, textCol, minFrequency).toDF()
  }

  /** [[learnBatched]]'s merge table — same surface as [[learnTable]]. */
  def learnBatchedTable(spark: SparkSession, corpus: DataFrame,
                        numMerges: Int, batchSize: Int,
                        textCol: String = "text",
                        minFrequency: Long = 2L): DataFrame = {
    import spark.implicits._
    learnBatched(corpus, numMerges, batchSize, textCol, minFrequency).toDF()
  }

  /** The vocabulary a merge table induces: the initial alphabet (bare +
    * `##` continuation forms actually present in the corpus) plus one
    * emitted symbol per merge, each with its learned rank (-1 = alphabet).
    * This is the artifact [[maxMatch]] serves from. */
  def vocabulary(corpus: DataFrame, merges: Seq[Merge],
                 textCol: String = "text"): DataFrame = {
    val alpha = BpeLearn.wordFrequencies(corpus, textCol)
      .select(explode(initialPieces(col("word"))).as("piece"))
      .distinct()
      .select(col("piece"), lit(-1).as("rank"))
    val learned = merges.map(m => (m.merged, m.rank))
    val spark = corpus.sparkSession
    import spark.implicits._
    alpha.unionByName(learned.toDF("piece", "rank"))
      .groupBy(col("piece")).agg(min(col("rank")).as("rank"))
  }

  /** WordPiece SERVING-side tokenization — greedy longest-match-first
    * (the MaxMatch algorithm BERT ships): repeatedly take the LONGEST
    * vocabulary piece that prefixes the remaining word, with `##` forms
    * required after the first piece; a word with any unmatched position
    * collapses to the single `[UNK]` piece (the reference behavior — no
    * partial output). In-row against a broadcast vocabulary: zero
    * shuffle, streaming-safe.
    *
    * Note this is NOT merge-order encoding: two words segmented by
    * [[learn]]'s training fold and by MaxMatch can differ — WordPiece
    * deploys MaxMatch (the published trade), while BPE deploys
    * merge-order. Both serving paths exist in the engine
    * ([[BpeLearn.segmentWords]] / here). */
  def maxMatch(words: DataFrame, vocab: Set[String],
               wordCol: String = "word", unk: String = "[UNK]"): DataFrame = {
    val pieces = graft.functions.WordPieceMatch(col(wordCol), vocab, unk)
    words.withColumn("pieces", pieces)
  }
}
