package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: assign documents to
  * fixed-token-budget training examples.
  *
  * True greedy bin packing is sequential; the distributed formulation
  * buckets documents deterministically (hash of the key — NOT round-robin,
  * which would depend on partition layout), orders each bucket by the key,
  * and cuts the running token count into budget-sized examples. A document
  * whose tokens straddle a budget boundary belongs to the example its START
  * offset falls in (examples may therefore exceed the budget by at most one
  * document's tail — the standard packing-with-overflow contract; callers
  * that need hard caps truncate documents first).
  *
  * Scale shape: one shuffle on (bucket) for the window; bucket count scales
  * the parallelism and bounds per-task state. Everything is a pure window
  * cumsum — deterministic across runs/engines, no driver-side loop.
  */
object Packing {

  /** Add `bucket` and `example_id` columns.
    *
    * @param tokenCountCol per-document token count (precomputed — e.g.
    *        `size(TextAnalysis.tokens(text))`)
    * @param budget        tokens per training example
    * @param numBuckets    parallel packing streams; examples are
    *        (bucket, example_id) pairs */
  def packByBudget(df: DataFrame, tokenCountCol: String, budget: Int,
                   keyCol: String, numBuckets: Int = 64): DataFrame = {
    require(budget > 0 && numBuckets > 0)
    // deterministic bucket: md5-hex prefix of the key modulo numBuckets
    // (same engine-stable draw the Sampling operators use)
    val bucket = (conv(Sampling.draw(col(keyCol), "pack"), 16, 10)
      .cast("long") % numBuckets).cast("int")
    val w = Window.partitionBy(col("bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("bucket", bucket)
      .withColumn("__cum", sum(col(tokenCountCol)).over(w))
      // start offset of this document = cum - own tokens
      .withColumn("example_id",
        ((col("__cum") - col(tokenCountCol)) / budget).cast("long"))
      .drop("__cum")
  }

  /** Per-example rollup: how full each packed example is. */
  def exampleStats(packed: DataFrame, tokenCountCol: String): DataFrame =
    packed.groupBy(col("bucket"), col("example_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCountCol)).as("n_tokens"))

  /** GPT-style CONCAT-AND-SLICE sequence preparation — the autoregressive
    * pretraining shape ([[packByBudget]]'s complement): documents are
    * concatenated in a deterministic per-bucket stream with an
    * end-of-document separator token, then the stream is cut into EXACT
    * `seqLen`-token sequences; documents straddle sequence boundaries
    * (every sequence except a bucket's last is exactly full — zero
    * padding waste, the trade the causal-LM objective tolerates because
    * the separator resets context).
    *
    * Distributed formulation, linear in corpus tokens with NO per-token
    * shuffle: per bucket (md5-hash of the key — partition-layout-free),
    * a window cumsum gives each document its stream offset; the document
    * then EXPLODES into only the sequences it intersects (ceil(n/seqLen)
    * + 1 rows — output-shaped), each carrying a codegen'd `slice` of its
    * token array pre-joined to a string; per-(bucket, seq) assembly is
    * the window-ordered collection idiom. ONE shuffle total (audited):
    * the (bucket, seq_id) window and aggregation ride the bucket
    * exchange's partitioning — same-bucket rows stay co-located — with
    * only a local re-sort.
    *
    * Output: (bucket, seq_id, n_docs, n_tokens, seq_text) — n_tokens ==
    * seqLen everywhere except each bucket's final partial sequence.
    * Tokens come from the native 1-gram [[graft.functions.WordShingles]]
    * scan; an empty document still contributes its separator. */
  def concatSlice(docs: DataFrame, seqLen: Int, keyCol: String = "doc_id",
                  textCol: String = "text", numBuckets: Int = 8,
                  eod: String = "<eod>"): DataFrame = {
    require(seqLen > 0 && numBuckets > 0,
      s"seqLen=$seqLen numBuckets=$numBuckets")
    // no exemption for keyCol: a key named e.g. "seq_id" is renamed to
    // __key and then shadowed by internal columns — confusing schemas,
    // not a supported use (ADVICE r12)
    val reserved = Seq("bucket", "seq_id", "__key", "__toks", "__n", "__s")
    require(!docs.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by concatSlice")
    val w = Window.partitionBy(col("bucket")).orderBy(col("__key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL text chunks like empty text (one separator token) — without
    // the coalesce, size(NULL)=-1 shifts EVERY later offset in the
    // bucket and the null doc's own slice length goes negative
    val staged = docs
      .select(col(keyCol).as("__key"),
        concat(graft.functions.WordShingles
          .allShingles(coalesce(col(textCol), lit("")), 1),
          array(lit(eod))).as("__toks"))
      .withColumn("bucket", (conv(Sampling.draw(col("__key"), "slice"),
        16, 10).cast("long") % numBuckets).cast("int"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__s", sum(col("__n")).over(w) - col("__n"))
    val L = lit(seqLen.toLong)
    // the sequences this document intersects: floor(s/L) .. floor((s+n-1)/L)
    // — exact integer division (div), no float
    val sliced = staged
      .select(col("bucket"), col("__key"), col("__s"), col("__toks"),
        col("__n"),
        explode(sequence(expr(s"__s div $seqLen"),
          expr(s"(__s + __n - 1) div $seqLen"))).as("seq_id"))
      .select(col("bucket"), col("seq_id"), col("__s"),
        concat_ws(" ", slice(col("__toks"),
          (greatest(col("seq_id") * L, col("__s")) - col("__s") + lit(1L))
            .cast("int"),
          (least((col("seq_id") + lit(1L)) * L, col("__s") + col("__n")) -
            greatest(col("seq_id") * L, col("__s"))).cast("int")))
          .as("__piece"),
        (least((col("seq_id") + lit(1L)) * L, col("__s") + col("__n")) -
          greatest(col("seq_id") * L, col("__s"))).as("__plen"))
    val wRun = Window.partitionBy(col("bucket"), col("seq_id"))
      .orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliced
      .withColumn("__arr", collect_list(col("__piece")).over(wRun))
      .groupBy(col("bucket"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__plen")).as("n_tokens"),
        concat_ws(" ", max(col("__arr"))).as("seq_text"))
  }

  /** Packing-efficiency sweep — the "choose your sequence length" table
    * a training run consults before fixing its context size: for each
    * candidate seqLen, the waste each packing discipline pays, computed
    * in ONE corpus pass (a static per-candidate struct array unpivoted
    * at the end — the [[Curation.filterAblation]] discipline; adding a
    * candidate adds codegen'd columns, never a pass).
    *
    * Semantics per candidate L (mirrored by the DuckDB oracle):
    *  - CONCAT-AND-SLICE ([[concatSlice]]'s exact bucketing: md5 "slice"
    *    draw mod numBuckets, key order, each doc contributing
    *    tokenCount + eodTokens stream positions):
    *    `concat_sequences` = Σ_b ⌊stream_b / L⌋ full sequences,
    *    `concat_tail_tokens` = Σ_b (stream_b mod L) trailing tokens
    *    (the only waste this discipline pays), and `n_straddle` = docs
    *    whose [s, s+n) span crosses an L boundary (the
    *    attention-contamination count the no-straddle disciplines avoid);
    *  - NO-STRADDLE bin packing ([[packByBudget]] / [[SftPrep.packGreedy]]
    *    shape, raw token counts, no separators): `n_oversize` = docs with
    *    count > L (packGreedy's `overlong` — they truncate or drop),
    *    `overflow_tokens` = Σ max(0, count − L) lost to that,
    *    `lb_sequences` = Σ_b ⌈fit_b / L⌉ (the bin-packing LOWER bound per
    *    packing bucket — no algorithm beats it, so `lb_padding` =
    *    lb_sequences·L − Σ fit is the padding floor any greedy pays at
    *    least).
    *
    * Scale shape: one per-bucket window cumsum (the concatSlice window),
    * one bucket-keyed aggregation, one numBuckets-row global aggregation
    * — the corpus is scanned once and shuffles only its (key, count)
    * projection.
    *
    * Output: (seq_len, n_docs, total_tokens, n_oversize, overflow_tokens,
    * lb_sequences, lb_padding, concat_sequences, concat_tail_tokens,
    * n_straddle), one row per candidate, ordered by the caller. */
  def packingEfficiency(docs: DataFrame, tokenCountCol: String,
                        seqLens: Seq[Int], keyCol: String,
                        numBuckets: Int = 8,
                        eodTokens: Int = 1): DataFrame = {
    require(seqLens.nonEmpty && seqLens.forall(_ > 0),
      s"seqLens must be positive, got $seqLens")
    require(seqLens.distinct.size == seqLens.size,
      s"duplicate candidate seqLens: $seqLens")
    require(numBuckets > 0 && eodTokens >= 0,
      s"numBuckets=$numBuckets eodTokens=$eodTokens")
    val reserved = Seq("bucket", "__key", "__n", "__sn", "__s")
    require(!docs.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by packingEfficiency")
    val w = Window.partitionBy(col("bucket")).orderBy(col("__key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = docs
      .select(col(keyCol).as("__key"),
        col(tokenCountCol).cast("long").as("__n"))
      .withColumn("bucket", (conv(Sampling.draw(col("__key"), "slice"),
        16, 10).cast("long") % numBuckets).cast("int"))
      .withColumn("__sn", col("__n") + lit(eodTokens.toLong))
      .withColumn("__s", sum(col("__sn")).over(w) - col("__sn"))
    // per-bucket partials: per candidate L the doc-level sums, plus the
    // bucket stream length the concat metrics derive from
    val bucketAggs: Seq[Column] =
      Seq(count(lit(1)).as("__docs"), sum(col("__n")).as("__toks"),
        sum(col("__sn")).as("__stream")) ++
        seqLens.zipWithIndex.flatMap { case (l, i) =>
          val L = lit(l.toLong)
          Seq(
            sum(when(expr(s"__s div $l") =!=
                expr(s"(__s + __sn - 1) div $l"), 1L).otherwise(0L))
              .as(s"__st$i"),
            sum(when(col("__n") > L, 1L).otherwise(0L)).as(s"__ov$i"),
            sum(greatest(col("__n") - L, lit(0L))).as(s"__of$i"),
            sum(least(col("__n"), L)).as(s"__fit$i"))
        }
    val perBucket = staged.groupBy(col("bucket"))
      .agg(bucketAggs.head, bucketAggs.tail: _*)
    // numBuckets-row global rollup; ⌈fit_b/L⌉ and stream_b div/mod fold
    // here, where the per-bucket values still exist
    val globalAggs: Seq[Column] =
      Seq(sum(col("__docs")).as("__docs"), sum(col("__toks")).as("__toks")) ++
        seqLens.zipWithIndex.flatMap { case (l, i) =>
          Seq(
            sum(col(s"__st$i")).as(s"__st$i"),
            sum(col(s"__ov$i")).as(s"__ov$i"),
            sum(col(s"__of$i")).as(s"__of$i"),
            sum(col(s"__fit$i")).as(s"__fit$i"),
            sum(expr(s"(__fit$i + ${l - 1}) div $l")).as(s"__lb$i"),
            sum(expr(s"__stream div $l")).as(s"__cs$i"),
            sum(expr(s"__stream % $l")).as(s"__ct$i"))
        }
    val global = perBucket.agg(globalAggs.head, globalAggs.tail: _*)
    val entries = seqLens.zipWithIndex.map { case (l, i) =>
      struct(lit(l).as("seq_len"), col("__docs").as("n_docs"),
        col("__toks").as("total_tokens"),
        col(s"__ov$i").as("n_oversize"), col(s"__of$i").as("overflow_tokens"),
        col(s"__lb$i").as("lb_sequences"),
        (col(s"__lb$i") * lit(l.toLong) - col(s"__fit$i")).as("lb_padding"),
        col(s"__cs$i").as("concat_sequences"),
        col(s"__ct$i").as("concat_tail_tokens"),
        col(s"__st$i").as("n_straddle"))
    }
    global.select(explode(array(entries: _*)).as("__e")).select(col("__e.*"))
  }

  /** Deterministic global shuffle + shard assignment — the training-output
    * prep step: order the corpus by an md5 hash draw (a reproducible
    * permutation), number it 0..N-1, and deal positions round-robin into
    * `numShards` shard files (shard = pos % numShards, pos_in_shard =
    * pos / numShards — balanced to within one row by construction). The
    * permutation is a pure function of (key, salt), so re-running the
    * pipeline regenerates byte-identical shards, and a data loader reading
    * shard k in pos_in_shard order replays a fixed slice of one global
    * shuffle — epoch determinism without materializing an index.
    *
    * Scale shape: the global row number is the same inherently-sequential
    * prefix shape as [[Sampling.tokenBudgetMix]], and gets the same
    * TWO-PHASE cut: bucket rows by the first `drawPrefixLen` hex digits of
    * the draw (a fixed-length prefix orders exactly like the full draw),
    * count per bucket in one narrow aggregation, turn counts into exclusive
    * base offsets with a window over that 16^drawPrefixLen-row aggregate,
    * then rank within each bucket and add the base — parallelism
    * 16^drawPrefixLen tasks instead of ONE. `drawPrefixLen = 0` keeps the
    * single-window formulation (the semantics reference; spec-proven equal).
    * SIZE BOUND: the per-bucket rank is a `row_number` (32-bit) — a bucket
    * must stay under 2³¹ rows, so size drawPrefixLen ≥ ceil(log₁₆(N/2³¹))
    * (2 hex digits cover half a trillion rows; 3 cover 8×10¹²).
    *
    * NULL keys coalesce to the empty-string draw (sorts first, one shared
    * draw), the [[Sampling.tokenBudgetMix]] convention. */
  def shardAssign(df: DataFrame, numShards: Int, keyCol: String,
                  salt: String = "", drawPrefixLen: Int = 2): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(drawPrefixLen >= 0 && drawPrefixLen <= 8,
      s"drawPrefixLen must be in [0, 8], got $drawPrefixLen")
    val reserved = Seq("shard", "pos_in_shard", "__draw", "__bkt", "__base", "__pos")
    require(!df.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by shardAssign")
    val W = Window
    val theDraw = coalesce(Sampling.draw(col(keyCol), salt), lit(""))
    val withPos =
      if (drawPrefixLen == 0) {
        val w = W.orderBy(col("__draw"), col(keyCol))
        df.withColumn("__draw", theDraw)
          .withColumn("__pos", row_number().over(w).cast("long") - 1)
      } else {
        val withDraw = df
          .withColumn("__draw", theDraw)
          .withColumn("__bkt", substring(col("__draw"), 1, drawPrefixLen))
        // phase 1: per-bucket counts -> exclusive base offsets; the window
        // runs over the <= 16^drawPrefixLen-row aggregate only
        val wBase = W.orderBy(col("__bkt"))
          .rowsBetween(W.unboundedPreceding, -1)
        val bases = withDraw.groupBy(col("__bkt"))
          .agg(count(lit(1)).as("__n"))
          .withColumn("__base", coalesce(sum(col("__n")).over(wBase), lit(0L)))
          .select(col("__bkt"), col("__base"))
        // phase 2: rank within the bucket, offset by its base
        val wIn = W.partitionBy(col("__bkt"))
          .orderBy(col("__draw"), col(keyCol))
        withDraw.join(broadcast(bases), Seq("__bkt"))
          .withColumn("__pos",
            col("__base") + row_number().over(wIn).cast("long") - 1)
      }
    withPos
      .withColumn("shard", (col("__pos") % numShards).cast("int"))
      // floor(long/int) is exact here: __pos stays far under 2^52, where
      // the double quotient cannot round across an integer boundary
      .withColumn("pos_in_shard", floor(col("__pos") / numShards))
      .select((df.columns.map(col) ++ Seq(col("shard"), col("pos_in_shard"))).toSeq: _*)
  }

  /** SIZE-BALANCED shard assignment (L147) — sorted round-robin: rows
    * ranked (size DESC, md5 draw, key) and dealt `rank mod numShards`.
    * [[shardAssign]] balances COUNTS (hash order is size-blind — one
    * shard can draw the long docs and run minutes longer under a
    * data-parallel loader); sorted round-robin bounds the token spread
    * instead: descending deal keeps every shard within one largest-item
    * of its neighbors (the classic LPT bound for identical machines at
    * this deal discipline), and the md5 draw inside a size class keeps
    * the assignment reproducible and content-blind.
    *
    * Scale shape: the global rank is the [[shardAssign]] two-phase cut
    * with (size, draw-prefix) buckets — one narrow (size, bucket) count
    * aggregation, exclusive base offsets from a window over that
    * aggregate (distinct-sizes × 16^drawPrefixLen rows; token counts
    * are a bounded integer domain — band the size first if yours
    * isn't), rank within (size, bucket). `drawPrefixLen = 0` keeps the
    * single-window reference formulation (the oracle's shape — parity
    * proves the two-phase cut exact).
    *
    * Output: input columns + `shard`. */
  def shardBalancedBySize(df: DataFrame, numShards: Int, sizeCol: String,
                          keyCol: String, salt: String = "",
                          drawPrefixLen: Int = 2): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(drawPrefixLen >= 0 && drawPrefixLen <= 8,
      s"drawPrefixLen must be in [0, 8], got $drawPrefixLen")
    val reserved = Seq("shard", "__draw", "__bkt", "__base", "__pos", "__n")
    require(!df.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by shardBalancedBySize")
    val W = Window
    val withDraw = df.withColumn("__draw",
      coalesce(Sampling.draw(col(keyCol), salt), lit("")))
    val withPos =
      if (drawPrefixLen == 0) {
        val w = W.orderBy(col(sizeCol).desc, col("__draw"), col(keyCol))
        withDraw.withColumn("__pos", row_number().over(w).cast("long") - 1)
      } else {
        val wd = withDraw
          .withColumn("__bkt", substring(col("__draw"), 1, drawPrefixLen))
        val wBase = W.orderBy(col(sizeCol).desc, col("__bkt"))
          .rowsBetween(W.unboundedPreceding, -1)
        val bases = wd.groupBy(col(sizeCol), col("__bkt"))
          .agg(count(lit(1)).as("__n"))
          .withColumn("__base", coalesce(sum(col("__n")).over(wBase), lit(0L)))
          .select(col(sizeCol), col("__bkt"), col("__base"))
        val wIn = W.partitionBy(col(sizeCol), col("__bkt"))
          .orderBy(col("__draw"), col(keyCol))
        wd.join(broadcast(bases), Seq(sizeCol, "__bkt"))
          .withColumn("__pos",
            col("__base") + row_number().over(wIn).cast("long") - 1)
      }
    withPos
      .withColumn("shard", (col("__pos") % numShards).cast("int"))
      .select(df.columns.map(col) :+ col("shard"): _*)
  }

  /** Per-shard balance rollup for [[shardBalancedBySize]] (or any
    * sharded frame): doc count, token total, and the global max-min
    * spread as a micro ratio of the largest shard (repeated on every
    * row — the one-row extreme frame rides a broadcast, no second
    * pass). */
  def shardBalanceReport(assigned: DataFrame, sizeCol: String): DataFrame = {
    val roll = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).cast("long").as("total_tokens"))
    val mm = roll.agg(max(col("total_tokens")).as("__mx"),
      min(col("total_tokens")).as("__mn"))
    // __mx = 0 (every shard's token total zero) is a perfectly-balanced
    // degenerate, not a division error: pin imbalance to 0 rather than
    // letting Spark null the cell where an integer engine would raise.
    roll.crossJoin(broadcast(mm))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        when(col("__mx") === 0L, 0L)
          .otherwise(expr("((__mx - __mn) * 1000000) div __mx"))
          .as("imbalance_micro"))
  }

  /** Reproducibility manifest for a sharded training output: per shard,
    * member count, token total, the position span, and an ORDER-DEFINED
    * digest — md5 over the member ids joined in `pos_in_shard` order,
    * exactly the sequence a data loader replays — so two pipeline runs
    * (or two engines) can assert byte-identical training order by
    * comparing one row per shard instead of the shards themselves.
    *
    * Scale shape: the ordered digest rides the window-ordered collection
    * idiom on the shard partitioning (same discipline as
    * [[concatSlice]]'s per-sequence assembly) — one exchange, shard
    * membership never leaves its partition. A shard's id list must fit a
    * collection buffer (shards are sized by numShards — pick it so
    * corpus/numShards ids ≈ tens of MB, the same bound the shard FILE
    * itself obeys). `idCol` must be non-null: collect_list skips nulls,
    * so a null id would silently vanish from the digest while still
    * counting in n_docs — shardAssign keys are ids, so this holds by
    * construction on its output. */
  def shardManifest(sharded: DataFrame, idCol: String,
                    tokenCountCol: String): DataFrame = {
    val reserved = Seq("n_docs", "total_tokens", "first_pos", "last_pos",
      "members_md5", "__arr")
    require(!sharded.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by shardManifest")
    val w = Window.partitionBy(col("shard")).orderBy(col("pos_in_shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("__arr",
        collect_list(col(idCol).cast("string")).over(w))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCountCol)).as("total_tokens"),
        min(col("pos_in_shard")).as("first_pos"),
        max(col("pos_in_shard")).as("last_pos"),
        md5(concat_ws("|", max(col("__arr"))).cast("binary"))
          .as("members_md5"))
  }

  /** Deterministic PROPORTIONAL-INTERLEAVE training order — the epoch
    * ordering step: every prefix of the global order carries each stratum
    * (language, source, mixture component) in proportion to its size, so
    * a training run that stops early — or a curriculum window — has seen
    * the mixture, not whichever stratum happened to sort first. Each stratum
    * gets a reproducible internal permutation (the md5 draw), and a
    * document at per-stratum rank r (0-based, n_s docs) gets
    * `order_key = (r + 0.5) / n_s` — stratum s's documents sit at the
    * midpoints of n_s equal slices of [0, 1), so sorting by
    * (order_key, draw, key) interleaves strata exactly proportionally
    * (within ±1 per prefix) without any cross-stratum coordination.
    *
    * Scale shape: the per-stratum rank is the [[shardAssign]] two-phase
    * cut applied per (stratum, draw-hex-prefix) — one narrow count
    * aggregation, per-stratum base offsets from a window over that small
    * aggregate, rank within (stratum, bucket) — parallelism strata ×
    * 16^drawPrefixLen. Stratum sizes ride the same aggregate; the final
    * key is a pure projection. Consumers materialize the order by sorting
    * on (order_key, __draw-tiebreak) — a range-partitioned parallel sort,
    * NOT a single-task window. `drawPrefixLen = 0` keeps the
    * single-window-per-stratum reference formulation (spec-proven equal).
    *
    * Output: input columns + (epoch_rank, order_key). */
  def epochInterleave(df: DataFrame, strataCol: String, keyCol: String,
                      salt: String = "", drawPrefixLen: Int = 2)
      : DataFrame = {
    require(drawPrefixLen >= 0 && drawPrefixLen <= 8,
      s"drawPrefixLen must be in [0, 8], got $drawPrefixLen")
    val reserved = Seq("epoch_rank", "order_key", "__draw", "__bkt",
      "__base", "__ns")
    require(!df.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by epochInterleave")
    val W = Window
    val theDraw = coalesce(Sampling.draw(col(keyCol), salt), lit(""))
    val ranked =
      if (drawPrefixLen == 0) {
        val w = W.partitionBy(col(strataCol))
          .orderBy(col("__draw"), col(keyCol))
        val sizes = df.groupBy(col(strataCol))
          .agg(count(lit(1)).as("__ns"))
        df.withColumn("__draw", theDraw)
          .withColumn("epoch_rank", row_number().over(w).cast("long") - 1)
          .join(broadcast(sizes), Seq(strataCol))
      } else {
        val withDraw = df
          .withColumn("__draw", theDraw)
          .withColumn("__bkt", substring(col("__draw"), 1, drawPrefixLen))
        // strata × 16^drawPrefixLen rows: bucket counts, per-stratum
        // exclusive base offsets, and the stratum size in one pass
        val wBase = W.partitionBy(col(strataCol)).orderBy(col("__bkt"))
          .rowsBetween(W.unboundedPreceding, -1)
        val wAll = W.partitionBy(col(strataCol))
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        val bases = withDraw.groupBy(col(strataCol), col("__bkt"))
          .agg(count(lit(1)).as("__n"))
          .withColumn("__base", coalesce(sum(col("__n")).over(wBase), lit(0L)))
          .withColumn("__ns", sum(col("__n")).over(wAll))
          .select(col(strataCol), col("__bkt"), col("__base"), col("__ns"))
        val wIn = W.partitionBy(col(strataCol), col("__bkt"))
          .orderBy(col("__draw"), col(keyCol))
        withDraw.join(broadcast(bases), Seq(strataCol, "__bkt"))
          .withColumn("epoch_rank",
            col("__base") + row_number().over(wIn).cast("long") - 1)
      }
    ranked
      .withColumn("order_key",
        (col("epoch_rank").cast("double") + lit(0.5)) /
          col("__ns").cast("double"))
      .select((df.columns.map(col) ++
        Seq(col("epoch_rank"), col("order_key"))).toSeq: _*)
  }

  /** Fixed-size CONTEXT GROUPS within strata — the in-context-pretraining
    * arrangement (Shi et al. 2023: fill each training context with
    * RELATED documents instead of random ones): upstream clustering
    * (semantic cells from [[KMeans.assign]], a topic label, a domain)
    * provides the stratum, and this operator deals each stratum's
    * members into consecutive groups of `groupSize` under a reproducible
    * md5 permutation — group g of stratum s is one context window's
    * membership, every member semantically adjacent by construction.
    * The last group of a stratum may be short (the loader pads it).
    *
    * Ranks ride [[epochInterleave]]'s two-phase machinery (no stratum
    * sorts through one task); the group split is a pure integer
    * projection on the rank. Output: input + (ctx_rank, ctx_group,
    * pos_in_group). */
  def contextGroups(df: DataFrame, strataCol: String, keyCol: String,
                    groupSize: Int, salt: String = "",
                    drawPrefixLen: Int = 2): DataFrame = {
    require(groupSize >= 1, s"groupSize=$groupSize: need >= 1")
    val reserved = Seq("ctx_rank", "ctx_group", "pos_in_group")
    require(!df.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by contextGroups")
    epochInterleave(df, strataCol, keyCol, salt, drawPrefixLen)
      .withColumn("ctx_rank", col("epoch_rank"))
      .withColumn("ctx_group", expr(s"epoch_rank div $groupSize"))
      .withColumn("pos_in_group",
        pmod(col("epoch_rank"), lit(groupSize.toLong)))
      .select((df.columns.map(col) ++ Seq(col("ctx_rank"),
        col("ctx_group"), col("pos_in_group"))).toSeq: _*)
  }

  /** Deterministic CURRICULUM training order: equal-population difficulty
    * bands (exact quantile cuts over `scoreCol`), easy band first, an
    * md5-shuffled permutation WITHIN each band — the curriculum-learning
    * data order (difficulty ramps across training, examples decorrelate
    * within a stage).
    *
    * Band cuts are the numBands−1 exact percentiles of the score in ONE
    * narrow aggregation (the CCNet-cut discipline — `percentile`'s
    * interpolation matches DuckDB's quantile_cont bit for bit); the cut
    * row broadcasts and band(x) = #cuts strictly below x is a static
    * codegen'd sum of comparisons (ties at a cut land in the LOWER band).
    * NOTE exact percentile buffers (value → count) per aggregation
    * buffer — fine for the discrete difficulty scores curricula use
    * (length, integer quality tiers); for unbounded continuous scores
    * pre-quantize or take cuts from [[CorpusStats.histogramQuantiles]].
    *
    * Within-band ranks ride [[epochInterleave]]'s two-phase rank
    * machinery with the band as the stratum — no band ever sorts through
    * one task. The global order needs NO band-offset pass:
    * `curriculum_key = (band + order_key) / numBands` is a pure
    * projection, strictly increasing in (band, band_rank) — sorting by
    * it replays the curriculum, and every prefix of a band's key range
    * interleaves that band's strata-of-one uniformly.
    *
    * NULL difficulty scores get a NULL band (and a null curriculum_key):
    * percentile cuts skip nulls, so silently banding them would both
    * front-load unscored documents as "easiest" and break the
    * equal-population contract — the null band makes them visible, and
    * the caller decides their fate (filter, impute, or train last).
    *
    * Output: input columns + (band, band_rank, curriculum_key). */
  def curriculumOrder(df: DataFrame, scoreCol: String, keyCol: String,
                      numBands: Int, salt: String = "",
                      drawPrefixLen: Int = 2): DataFrame = {
    require(numBands >= 1, s"numBands=$numBands: need >= 1")
    val reserved = Seq("band", "band_rank", "curriculum_key", "__cuts",
      "__rawband")
    require(!df.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by curriculumOrder")
    // null-score rows ride the SAME interleave pass under a sentinel
    // band (-1 — a null stratum would drop at the bucket equi-join, and
    // a bypass union would re-scan the source) and come out with null
    // band/rank/key: emitted, not silently lost — every input row is an
    // output row
    val banded =
      if (numBands == 1)
        df.withColumn("__rawband",
          when(col(scoreCol).isNull, lit(-1)).otherwise(lit(0)))
      else {
        // shared cut/tie/null semantics with CorpusStats.driftReport —
        // one definition of the quantile-bucket discipline
        val cuts = df.agg(CorpusStats.quantileCutExpr(col(scoreCol), numBands))
        df.crossJoin(broadcast(cuts))
          .withColumn("__rawband",
            coalesce(CorpusStats.bucketOf(col(scoreCol), numBands), lit(-1)))
          .drop("__cuts")
      }
    val scored = col("__rawband") >= 0
    epochInterleave(banded, "__rawband", keyCol, salt, drawPrefixLen)
      .select((df.columns.map(col) ++ Seq(
        when(scored, col("__rawband")).as("band"),
        when(scored, col("epoch_rank")).as("band_rank"),
        when(scored, (col("__rawband").cast("double") + col("order_key"))
          / lit(numBands.toDouble)).as("curriculum_key"))).toSeq: _*)
  }

  /** Multi-epoch training SCHEDULE with per-stratum epoch counts — the
    * "repeat epochs at the loader" side of up-weighting that
    * [[Sampling.temperatureMix]]'s scaladoc defers to (the Llama-style
    * mixing where a curated source runs ~4 epochs against 1 of web):
    * stratum s with weight w_s appears in ⌊w_s⌋ full epochs plus an
    * md5-gated FRACTIONAL epoch keeping share w_s − ⌊w_s⌋ of its
    * documents — no document duplication on disk, the schedule IS the
    * repetition.
    *
    * Each (doc, epoch) occurrence then gets the [[epochInterleave]]
    * proportional order key computed per (stratum, epoch) — a composite
    * stratum through the same two-phase rank machinery, so every epoch
    * is its own reproducible proportionally-interleaved permutation
    * (the epoch rides the draw key: permutations differ across epochs).
    *
    * Scale shape: the epoch explode is output-shaped (⌈w_s⌉ rows per
    * doc); everything else is [[epochInterleave]]'s documented shape.
    * Rows whose stratum has no weight drop (the mix convention).
    *
    * Output: input columns + (epoch, epoch_rank, order_key). */
  def epochSchedule(df: DataFrame, strataCol: String,
                    epochs: Map[String, Double], keyCol: String,
                    salt: String = "", drawPrefixLen: Int = 2): DataFrame = {
    require(epochs.nonEmpty && epochs.values.forall(_ > 0),
      "epochs must be a non-empty map of positive per-stratum weights")
    val reserved = Seq("__tot", "epoch", "epoch_rank", "order_key",
      "__es", "__ek")
    require(!df.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by epochSchedule")
    val wMap = map(epochs.toSeq.flatMap { case (s, w) =>
      Seq(lit(s), lit(w)) }: _*)
    val w = element_at(wMap, col(strataCol))
    val nFull = floor(w).cast("long")
    val frac = w - floor(w)
    val keepFrac = conv(Sampling.draw(col(keyCol), salt + ":frac"), 16, 10)
      .cast("long").cast("double") < frac * lit(4294967296.0)
    val staged = df
      .withColumn("__tot", nFull + when(keepFrac, 1L).otherwise(0L))
      .filter(col("__tot") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__tot") - 1L)))
      .drop("__tot")
      .withColumn("__es", concat_ws("\u0001", col(strataCol),
        col("epoch").cast("string")))
      .withColumn("__ek", concat_ws("\u0001", col(keyCol).cast("string"),
        col("epoch").cast("string")))
    epochInterleave(staged, "__es", "__ek", salt, drawPrefixLen)
      .drop("__es", "__ek")
  }

  /** Stateless ORDER-KEY twin of [[epochInterleave]] for streaming
    * ingest: `order_key = (draw + 0.5) / 2³²` — the document's position
    * in the uniform-hash CDF — assigned as a pure projection, no ranks,
    * no stratum sizes, no state. Two contracts tie it to the batch
    * operator:
    *  - WITHIN each stratum, sorting by (order_key, key) reproduces the
    *    batch operator's permutation EXACTLY (both order by the same
    *    draw; spec-enforced) — a consumer sorting a drained stream gets
    *    the same per-stratum epoch order the batch pass would emit;
    *  - ACROSS strata, every prefix [0, t) of the key space carries each
    *    stratum in proportion IN EXPECTATION (each stratum's draws are
    *    uniform), where the batch midpoint formula is proportional
    *    exactly — the price of statelessness: exact ±1 interleaving
    *    needs the per-stratum ranks only a batch pass can know.
    * Null keys get order_key 0.0 — STRICTLY below the zero draw's
    * (0 + 0.5)/2³² — mirroring [[epochInterleave]], whose null-key
    * coalesce to the empty-string draw `""` sorts strictly before
    * `"00000000"`; with equal keys the batch exactness contract holds
    * even when a null key and a genuine all-zero draw coexist. */
  def epochOrderStateless(df: DataFrame, keyCol: String,
                          salt: String = ""): DataFrame = {
    require(!df.columns.contains("order_key"),
      "order_key is reserved by epochOrderStateless")
    df.withColumn("order_key",
      when(col(keyCol).isNull, lit(0.0)).otherwise(
        (conv(Sampling.draw(col(keyCol), salt), 16, 10).cast("double")
          + lit(0.5)) / lit(4294967296.0)))
  }

  /** Split long documents into fixed-token-window chunks with overlap —
    * the context-window prep step for documents longer than the training
    * sequence length (each chunk re-reads `overlap` tokens of its
    * predecessor so no span is ever cut without context).
    *
    * Chunk starts step by `maxTokens - overlap`; the last chunk is the
    * first one whose window reaches the document's end (no degenerate
    * final sliver: a doc of maxTokens+1 tokens yields 2 chunks, not a
    * 1-token tail... it yields chunks starting at 0 and stride, the second
    * covering the remainder). Documents at or under `maxTokens` pass
    * through as their own single chunk.
    *
    * Shape: tokenize once, then a generated chunk-index array explodes
    * into slices — pure codegen'd projection + explode, no shuffle, no
    * state; order within a doc is the chunk index. Output: all input
    * columns plus (chunk_id, chunk_text, chunk_tokens). */
  def chunkDocuments(docs: DataFrame, maxTokens: Int, overlap: Int = 0,
                     textCol: String = "text"): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val reserved = Seq("chunk_id", "chunk_text", "chunk_tokens", "__toks", "__chunk")
    require(!docs.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by chunkDocuments")
    val stride = maxTokens - overlap
    // null text (a JSONL line without the field) chunks like empty text —
    // one ("", 0) chunk — instead of a poisoned (null, -1) row that would
    // silently corrupt downstream token accounting
    val toks = TextAnalysis.tokens(coalesce(col(textCol), lit("")))
    // number of chunks = ceil(max(n - overlap, 1) / stride); min 1
    val n = size(toks)
    val nChunks = greatest(
      ceil((n - lit(overlap)).cast("double") / stride).cast("int"), lit(1))
    docs
      .withColumn("__toks", toks)
      .withColumn("chunk_id",
        explode(sequence(lit(0), nChunks - 1)))
      .withColumn("__chunk",
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(maxTokens)))
      .withColumn("chunk_text", array_join(col("__chunk"), " "))
      .withColumn("chunk_tokens", size(col("__chunk")))
      .drop("__toks", "__chunk")
  }
}
