package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning / alignment data preparation: example
  * construction with loss-mask spans, no-straddle sequence packing, and
  * preference-pair mining.
  *
  * These are the post-pretraining half of a training-data pipeline: the
  * curated corpus becomes (prompt, response) examples rendered through a
  * chat template with a loss mask over the assistant span (only the
  * response trains), examples pack into fixed-length sequences WITHOUT
  * crossing document boundaries (unlike the causal-LM
  * [[Packing.concatSlice]], an SFT example must not straddle — attention
  * to a neighbouring conversation corrupts the objective, so bins hold
  * whole examples and eat the padding), and preference pairs (chosen,
  * rejected) feed a DPO/RLHF stage.
  *
  * Determinism discipline: every draw is an md5 hex prefix
  * ([[Sampling.draw]]), every ratio one double division of exact integer
  * counts, every order tie-broken on the key — results are a pure
  * function of the corpus in any engine.
  */
object SftPrep {

  // ---------------------------------------------------------------------
  // Example construction + chat-template rendering (L91)
  // ---------------------------------------------------------------------

  val UserTag = "<|user|>"
  val AssistantTag = "<|assistant|>"
  val EotTag = "<|eot|>"

  /** Deterministic (prompt, response) construction from plain documents —
    * the self-supervised SFT bootstrap (completion-style examples): the
    * first ceil(n/3) whitespace tokens become the prompt, the rest the
    * response; documents with fewer than 2 tokens carry no response and
    * are dropped. The rendered example is
    * `<|user|> P <|assistant|> R <|eot|>` and the LOSS MASK covers the
    * assistant span plus the end tag — `[mask_start, mask_end)` in
    * 0-based token indices of `sft_text` — so the prompt and template
    * tokens never contribute loss (the standard SFT objective).
    *
    * Pure projection: tokenization is one native byte-scan
    * ([[graft.functions.WordShingles]] 1-grams), slicing and rendering are
    * codegen'd array ops — zero shuffle, zero state, streaming-safe by
    * construction.
    *
    * Output: (doc_id, sft_text, n_tokens, n_prompt_tokens,
    * n_response_tokens, mask_start, mask_end). n_tokens = n + 3 template
    * tokens; mask_start = n_prompt_tokens + 2; mask_end = n_tokens. */
  def formatExamples(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val reserved = Seq("sft_text", "n_tokens", "n_prompt_tokens",
      "n_response_tokens", "mask_start", "mask_end", "__toks", "__n", "__p")
    require(!docs.columns.exists(c => reserved.contains(c)),
      s"${reserved.mkString("/")} are reserved by formatExamples")
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.WordShingles
          .allShingles(coalesce(col(textCol), lit("")), 1).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") >= 2)
      // ceil(n/3) as exact integer math; 1 <= __p <= n-1 for every n >= 2
      .withColumn("__p", expr("(__n + 2) div 3"))
      .select(
        col("doc_id"),
        concat_ws(" ",
          lit(UserTag),
          concat_ws(" ", slice(col("__toks"), lit(1), col("__p").cast("int"))),
          lit(AssistantTag),
          concat_ws(" ", slice(col("__toks"), (col("__p") + 1).cast("int"),
            (col("__n") - col("__p")).cast("int"))),
          lit(EotTag)).as("sft_text"),
        (col("__n") + 3).as("n_tokens"),
        col("__p").as("n_prompt_tokens"),
        (col("__n") - col("__p")).as("n_response_tokens"),
        (col("__p") + 2).as("mask_start"),
        (col("__n") + 3).as("mask_end"))
  }

  /** MULTI-TURN chat-template rendering with per-turn loss-mask spans —
    * [[formatExamples]] generalized from (prompt, response) pairs to
    * whole conversations (the production SFT shape: system/user/assistant
    * alternations where ONLY assistant spans train; Ouyang et al. 2022's
    * setup). Input is one row per turn: (convCol, turnIdxCol, roleCol,
    * textCol). Every turn renders as `<|role|> tokens…` and each
    * ASSISTANT turn closes with `<|eot|>`; the loss mask of an assistant
    * turn covers its response tokens plus the end tag (never the role
    * tag), non-assistant turns (user, system, tool — any role string)
    * carry an empty mask.
    *
    * Output: one row per TURN — (conv_id, turn_idx, role, span_start,
    * span_end, masked, mask_start, mask_end, n_tokens, sft_text) with
    * spans in 0-based token indices of the conversation's `sft_text`
    * (repeated per row, making each row self-contained; n_tokens is the
    * conversation total). Empty/null turn text renders as the bare tag.
    *
    * Scale shape: tokenization and per-turn rendering are pure
    * projections; span offsets are one conv-keyed window cumsum; the
    * conversation text assembles via the window-ordered collection idiom
    * ([[Packing.shardManifest]]: running collect_list, max = the full
    * ordered list since every running list is a prefix) and joins back
    * conv-keyed. Windows/joins are all bounded by a conversation's turn
    * count. */
  def formatConversation(turns: DataFrame, convCol: String = "conv_id",
                         turnIdxCol: String = "turn_idx",
                         roleCol: String = "role",
                         textCol: String = "text"): DataFrame = {
    val toks = graft.functions.WordShingles
      .allShingles(coalesce(col(textCol), lit("")), 1)
    val base = turns
      .select(col(convCol).as("conv_id"),
        col(turnIdxCol).cast("long").as("turn_idx"),
        col(roleCol).as("role"), toks.as("__toks"))
      .withColumn("__isa", col("role") === lit("assistant"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      // rendered turn = role tag ++ tokens ++ (eot if assistant)
      .withColumn("__rt", concat(
        array(concat(lit("<|"), col("role"), lit("|>"))),
        col("__toks"),
        when(col("__isa"), array(lit(EotTag)))
          .otherwise(array().cast("array<string>"))))
      .withColumn("__len", size(col("__rt")).cast("long"))
    val wCum = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSpans = base
      .withColumn("__end", sum(col("__len")).over(wCum))
      .withColumn("span_start", col("__end") - col("__len"))
      .withColumn("__arr", collect_list(col("__rt")).over(wCum))
    val conv = withSpans.groupBy(col("conv_id"))
      .agg(max(col("__arr")).as("__all"), sum(col("__len")).as("n_tokens"))
      .select(col("conv_id"), col("n_tokens"),
        array_join(flatten(col("__all")), " ").as("sft_text"))
    withSpans
      .select(col("conv_id"), col("turn_idx"), col("role"),
        col("span_start"), col("__end").as("span_end"), col("__isa"),
        col("__n"))
      .join(conv, Seq("conv_id"))
      .select(col("conv_id"), col("turn_idx"), col("role"),
        col("span_start"), col("span_end"),
        col("__isa").as("masked"),
        when(col("__isa"), col("span_start") + 1)
          .otherwise(col("span_end")).as("mask_start"),
        col("span_end").as("mask_end"),
        col("n_tokens"), col("sft_text"))
  }

  // ---------------------------------------------------------------------
  // No-straddle greedy packing (L92)
  // ---------------------------------------------------------------------

  /** First-fit no-straddle packing: examples, in a reproducible md5-draw
    * order within each hash bucket, fill fixed-capacity bins greedily —
    * when the next example would overflow `seqLen`, a new bin starts;
    * an example longer than `seqLen` sits alone in its bin (flagged
    * `overlong`; truncation policy is the consumer's). No example ever
    * splits across bins — the SFT packing contract.
    *
    * The greedy recurrence (bin boundary c_{k+1} = f(c_k)) is inherently
    * sequential, so the distributed formulation computes it the way
    * [[Dedup.connectedComponents]] computes label propagation — by
    * POINTER DOUBLING over the hop function instead of a driver loop over
    * rows:
    *
    *  1. per bucket, a window cumsum gives prefix sums S_i; the hop
    *     f(c) = max(c+1, #{j : S_j <= S_c + seqLen}) — "the last example
    *     that still fits a bin opened after position c" — comes from ONE
    *     sorted-merge rank lookup: items (S_j) and queries (S_c + L)
    *     union into a per-bucket event stream, and a running count of
    *     items at each query position is the rank (no range join);
    *  2. bin boundaries are the orbit of 0 under f: K = ceil(log2(m+1))
    *     rounds of A := A ∪ g(A), g := g ∘ g with g eagerly
    *     checkpointed — every round is a pair of (bucket, c)-keyed
    *     equi-joins, so a bucket of a million examples needs ~20 rounds,
    *     not a million driver trips;
    *  3. bin ids and in-bin positions come from one more sorted-merge
    *     pass against the boundary set.
    *
    * Buckets bound every window and join (size numBuckets to taste —
    * corpus/numBuckets rows each); the per-bucket row_number is 32-bit,
    * the same bound as [[Packing.shardAssign]]'s per-bucket rank.
    *
    * SIZE-GATED FAST PATH (the [[Dedup.connectedComponents]] discipline):
    * at or under `maxLocalExamples` total rows the bin boundaries come
    * from an exact sequential walk on the driver — the boundary set is
    * tiny and paying ~log₂ m rounds of distributed checkpoint latency on
    * a driver-sized frame is the scale smell, not the fix. The doubling
    * route is the shape that holds when the example table itself is too
    * big to collect; `maxLocalExamples = 0` forces it (spec-pinned
    * equal). Both routes produce identical boundaries by construction
    * (property-checked against the same sequential reference).
    *
    * Output: input columns + (bucket, pack_idx, bin_id, pos_in_bin,
    * overlong) — pack_idx is the 1-based draw-order index within the
    * bucket; bin_id is 0-based per bucket. */
  def packGreedy(examples: DataFrame, lenCol: String, seqLen: Long,
                 keyCol: String, numBuckets: Int = 8,
                 salt: String = "pack",
                 maxLocalExamples: Int = 500000): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen")
    require(numBuckets > 0, s"numBuckets=$numBuckets")
    val reserved = Seq("bucket", "pack_idx", "bin_id", "pos_in_bin",
      "overlong", "__draw", "__S", "__c", "__q", "__f", "__m", "__val",
      "__kind", "__cnt", "__cut")
    require(!examples.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by packGreedy")

    // ---- order + prefix sums, one per-bucket window -------------------
    val wOrd = Window.partitionBy(col("bucket"))
      .orderBy(col("__draw"), col(keyCol))
    val wSum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = examples
      .withColumn("__draw", Sampling.draw(col(keyCol), salt))
      .withColumn("bucket", (conv(col("__draw"), 16, 10).cast("long")
        % numBuckets).cast("int"))
      .withColumn("pack_idx", row_number().over(wOrd).cast("long"))
      .withColumn("__S", sum(col(lenCol).cast("long")).over(wSum))
      .localCheckpoint(true)

    // per-bucket sizes; numBuckets rows — broadcast everywhere below
    val sizes = base.groupBy(col("bucket"))
      .agg(max(col("pack_idx")).as("__m"))
    val szRow = sizes.agg(max(col("__m")), sum(col("__m"))).collect().head
    val maxM = if (szRow.isNullAt(0)) 0L else szRow.getLong(0)
    val total = if (szRow.isNullAt(1)) 0L else szRow.getLong(1)
    if (maxM == 0L)
      return base.select((examples.columns.map(col) ++ Seq(col("bucket"),
        col("pack_idx"), lit(0L).as("bin_id"), lit(0L).as("pos_in_bin"),
        lit(false).as("overlong"))).toSeq: _*)

    val bounds: DataFrame =
      if (maxLocalExamples > 0 && total <= maxLocalExamples)
        localBounds(base, lenCol, seqLen)
      else
        doublingBounds(base, lenCol, seqLen, sizes, maxM)

    // ---- bin assignment, one more sorted-merge pass ------------------
    // example i joins the bin opened by the greatest boundary c < i:
    // bin_id = #{c : c < i} - 1, pos_in_bin = i - c - 1. Boundaries sort
    // before examples at equal position (c = i-1 opens i's bin).
    val evCuts = bounds.select(col("bucket"), col("__c").as("__val"),
      lit(0).as("__kind"), lit(0L).as("__c"))
    val evRows = base.select(col("bucket"),
      (col("pack_idx") - 1).as("__val"), lit(1).as("__kind"),
      col("pack_idx").as("__c"))
    val wAsn = Window.partitionBy(col("bucket"))
      .orderBy(col("__val"), col("__kind"), col("__c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assign = evCuts.unionByName(evRows)
      .withColumn("bin_id",
        sum(when(col("__kind") === 0, 1L).otherwise(0L)).over(wAsn) - 1)
      .withColumn("__cut",
        max(when(col("__kind") === 0, col("__val"))).over(wAsn))
      .filter(col("__kind") === 1)
      .select(col("bucket"), col("__c").as("pack_idx"), col("bin_id"),
        (col("pack_idx") - col("__cut") - 1).as("pos_in_bin"))

    base
      .join(assign, Seq("bucket", "pack_idx"))
      .withColumn("overlong", col(lenCol).cast("long") > seqLen)
      .select((examples.columns.map(col) ++ Seq(col("bucket"),
        col("pack_idx"), col("bin_id"), col("pos_in_bin"),
        col("overlong"))).toSeq: _*)
  }

  /** Exact sequential boundary walk on the driver — the recurrence the
    * distributed routes compute, on a frame small enough to collect
    * (examples are one row each; 500k rows ≈ 12 MB). */
  private def localBounds(base: DataFrame, lenCol: String,
                          seqLen: Long): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val rows = base.select(col("bucket"), col("pack_idx"),
      col(lenCol).cast("long")).collect()
    rows.groupBy(_.getInt(0)).toSeq.flatMap { case (b, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      val cuts = Seq.newBuilder[(Int, Long)]
      cuts += ((b, 0L))
      var fill = 0L
      var started = false
      ordered.foreach { r =>
        val len = r.getLong(2)
        if (started && fill + len > seqLen) {
          cuts += ((b, r.getLong(1) - 1)); fill = 0L
        }
        started = true
        fill += len
      }
      cuts.result()
    }.toDF("bucket", "__c")
  }

  /** Distributed boundary computation: hop function by sorted-merge rank,
    * orbit of 0 by pointer doubling — the route that needs nothing on the
    * driver beyond the round count. */
  private def doublingBounds(base: DataFrame, lenCol: String, seqLen: Long,
                             sizes: DataFrame, maxM: Long): DataFrame = {
    // ---- hop function f(c), one sorted-merge rank pass ---------------
    // items: (S_j, j); queries: (S_c + L, c) with c = pack_idx - 1 and
    // S_c = S_i - len_i read off each row (covers c = 0 .. m-1 exactly).
    // At equal value items sort before queries (<= semantics).
    val items = base.select(col("bucket"), col("__S").as("__val"),
      lit(0).as("__kind"), col("pack_idx").as("__c"))
    val queries = base.select(col("bucket"),
      (col("__S") - col(lenCol).cast("long") + lit(seqLen)).as("__val"),
      lit(1).as("__kind"), (col("pack_idx") - 1).as("__c"))
    val wRank = Window.partitionBy(col("bucket"))
      .orderBy(col("__val"), col("__kind"), col("__c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hop0 = items.unionByName(queries)
      .withColumn("__cnt",
        sum(when(col("__kind") === 0, 1L).otherwise(0L)).over(wRank))
      .filter(col("__kind") === 1)
      .join(broadcast(sizes), Seq("bucket"))
      .select(col("bucket"), col("__c"),
        least(col("__m"), greatest(col("__cnt"), col("__c") + 1)).as("__f"))
      .localCheckpoint(true)

    // ---- orbit of 0 under f by pointer doubling ----------------------
    // rounds: after K rounds the cut set holds f^j(0) for all j < 2^K;
    // bins per bucket <= m, so K = ceil(log2(maxM + 1)) suffices. g
    // saturates at values >= m (f is only defined below m) via the left
    // join's coalesce, so composition never drops rows.
    var cuts = sizes.select(col("bucket"), lit(0L).as("__c"))
      .localCheckpoint(true)
    var g = hop0
    var k = 0
    val rounds =
      math.ceil(math.log(maxM.toDouble + 1) / math.log(2.0)).toInt.max(1)
    while (k < rounds) {
      cuts = cuts.unionByName(
          cuts.join(g, Seq("bucket", "__c"))
            .select(col("bucket"), col("__f").as("__c")))
        .distinct()
        .localCheckpoint(true)
      k += 1
      if (k < rounds) {
        val gb = g.select(col("bucket").as("__b2"), col("__c").as("__c2"),
          col("__f").as("__f2"))
        g = g.join(gb,
            col("bucket") === col("__b2") && col("__f") === col("__c2"),
            "left")
          .select(col("bucket"), col("__c"),
            coalesce(col("__f2"), col("__f")).as("__f"))
          .localCheckpoint(true)
      }
    }
    // boundaries strictly inside the bucket (c = m means "no further bin")
    cuts.join(broadcast(sizes), Seq("bucket"))
      .filter(col("__c") < col("__m"))
      .select(col("bucket"), col("__c"))
  }

  // ---------------------------------------------------------------------
  // Preference-pair mining (L93)
  // ---------------------------------------------------------------------

  /** Preference pairs for DPO/RLHF-style training: within each stratum
    * (domain, source, prompt cluster), pair the rank-i BEST document by a
    * quality score with the rank-i WORST (chosen vs rejected), keep pairs
    * whose score margin reaches `minMargin`. The two rank lists draw from
    * disjoint halves (rank <= min(k, floor(m/2))), so no document appears
    * on both sides of any pair, and ties break on the id — the pair set
    * is a pure function of the corpus.
    *
    * Scale shape: both rank lists are k-bounded per stratum, so each runs
    * the [[Sampling.groupCap]] TWO-PHASE funnel — top-k within (stratum,
    * id-hash sub-partition), then top-k of the <= subPartitions×k
    * survivors — never a full per-stratum sort through one task. The
    * final pairing is a (stratum, rank) equi-join of two k-bounded
    * frames. `subPartitions = 1` keeps the single-window reference
    * formulation (the oracle's shape, so parity doubles as
    * funnel-exactness evidence).
    *
    * Output: (stratum, pair_rank, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin). */
  def preferencePairs(docs: DataFrame, strataCol: String, scoreCol: String,
                      idCol: String, k: Int, minMargin: Double,
                      subPartitions: Int = 1): DataFrame = {
    require(k >= 1, s"k=$k")
    require(subPartitions >= 1, s"subPartitions=$subPartitions")
    val m = docs.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("__m"))

    def ranked(desc: Boolean): DataFrame =
      funnelTopK(docs.select(col(strataCol).as("stratum"),
          col(scoreCol).cast("double").as("__score"), col(idCol).as("__id")),
        desc, k, subPartitions, "pair_rank")

    val top = ranked(desc = true)
      .select(col("stratum"), col("pair_rank"),
        col("__id").as("chosen_id"), col("__score").as("chosen_score"))
    val bot = ranked(desc = false)
      .select(col("stratum"), col("pair_rank"),
        col("__id").as("rejected_id"), col("__score").as("rejected_score"))
    top.join(bot, Seq("stratum", "pair_rank"))
      .join(broadcast(m), Seq("stratum"))
      // disjoint halves: both ranks stay within floor(m/2)
      .filter(col("pair_rank") <= least(lit(k.toLong), expr("__m div 2")))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .filter(col("margin") >= minMargin)
      .select(col("stratum"), col("pair_rank").cast("long").as("pair_rank"),
        col("chosen_id"), col("rejected_id"), col("chosen_score"),
        col("rejected_score"), col("margin"))
  }

  /** The shared k-bounded TWO-PHASE funnel: ranks 1..k per `stratum` by
    * (__score desc|asc, __id asc) without a full per-stratum sort through
    * one task — phase 1 takes top-k inside each (stratum, id-hash
    * sub-partition), phase 2 ranks the ≤ k·subPartitions survivors. The
    * funnel is EXACT (rank r ≤ k survives its sub-partition because at
    * most r−1 rows precede it there); parity of the consuming gates
    * against single-window oracles doubles as the exactness evidence.
    * Input columns: stratum, __score (double), __id. */
  private def funnelTopK(in: DataFrame, desc: Boolean, k: Int,
                         subPartitions: Int, rankName: String): DataFrame = {
    val ord =
      if (desc) Seq(col("__score").desc, col("__id").asc)
      else Seq(col("__score").asc, col("__id").asc)
    val funneled =
      if (subPartitions == 1) in
      else {
        val w1 = Window.partitionBy(col("stratum"),
            pmod(xxhash64(col("__id")), lit(subPartitions.toLong)))
          .orderBy(ord: _*)
        in.withColumn("__r1", row_number().over(w1))
          .filter(col("__r1") <= k).drop("__r1")
      }
    val w = Window.partitionBy(col("stratum")).orderBy(ord: _*)
    funneled.withColumn(rankName, row_number().over(w))
      .filter(col(rankName) <= k)
  }

  /** Rejection sampling / best-of-n selection — the RLHF-style candidate
    * filter: from a pool of scored responses per prompt (n sampled
    * generations judged by a reward model), keep the top `k` whose score
    * clears `minScore`, ranked best-first with ties to the lowest id.
    * This is the standard best-of-n / RFT (rejection-sampling
    * fine-tuning) data-prep step; the kept rows feed
    * [[formatExamples]]-style rendering or [[preferencePairs]] mining.
    *
    * Scale shape: the threshold prunes scan-side (predicate on the score
    * column, before any exchange); ranking rides the shared
    * [[funnelTopK]] two-phase funnel, so a hot prompt (thousands of
    * candidates) never funnels through one task. Output: (promptCol,
    * sample_rank 1..k, idCol, scoreCol) — score re-emitted as double. */
  def rejectionSample(candidates: DataFrame, promptCol: String,
                      scoreCol: String, idCol: String, k: Int,
                      minScore: Double, subPartitions: Int = 1): DataFrame = {
    require(k >= 1, s"k=$k")
    require(subPartitions >= 1, s"subPartitions=$subPartitions")
    val in = candidates
      .select(col(promptCol).as("stratum"),
        col(scoreCol).cast("double").as("__score"), col(idCol).as("__id"))
      .filter(col("__score") >= minScore)
    funnelTopK(in, desc = true, k, subPartitions, "sample_rank")
      .select(col("stratum").as(promptCol),
        col("sample_rank").cast("long").as("sample_rank"),
        col("__id").as(idCol), col("__score").as(scoreCol))
  }

  /** KV-cache prefix-sharing report (L143) — the inference-cost planning
    * table behind batch generation over an SFT/eval/best-of-n prompt
    * set: prompts sharing their first `prefixTokens` tokens prefill that
    * prefix ONCE under automatic prefix caching (vLLM-style), so every
    * group member after the first saves `prefix_len` tokens of prefill.
    * Template-rendered prompt sets ([[formatExamples]] output) share
    * template prefixes by construction — this is the report that prices
    * that reuse and ranks which templates to co-schedule.
    *
    * A prompt shorter than `prefixTokens` keys by its whole token
    * sequence (it can only share cache with exact equals). Only groups
    * with ≥ 2 prompts appear (singletons save nothing). All integer:
    * saved_tokens = (n_prompts − 1)·prefix_len, saved_micro =
    * saved·10⁶ div total_tokens.
    *
    * Scale shape: one codegen'd prefix projection + ONE prefix-keyed
    * aggregation with map-side combine. Nothing else. */
  def prefixCacheReport(prompts: DataFrame, prefixTokens: Int,
                        textCol: String = "text"): DataFrame = {
    require(prefixTokens >= 1, s"prefixTokens=$prefixTokens")
    val toks = graft.operators.TextAnalysis.tokens(col(textCol))
    // empty prompts have no prefix to share (and would zero the ratio's
    // denominator) — dropped by contract
    val keyed = prompts.select(
      concat_ws(" ", slice(toks, 1, prefixTokens)).as("prefix"),
      size(toks).cast("long").as("__n"))
      .filter(col("prefix") =!= "")
    keyed.groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_prompts"),
        least(min(col("__n")), lit(prefixTokens.toLong)).as("prefix_len"),
        sum(col("__n")).as("total_tokens"))
      .filter(col("n_prompts") >= 2)
      .select(col("prefix"), col("n_prompts"), col("prefix_len"),
        col("total_tokens"),
        ((col("n_prompts") - 1L) * col("prefix_len")).as("saved_tokens"),
        expr("((n_prompts - 1) * prefix_len * 1000000) div total_tokens")
          .as("saved_micro"))
  }
}
