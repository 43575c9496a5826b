package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5-style span-corruption sample preparation (Raffel et al. 2020 —
  * the denoising objective every encoder-decoder pretrain feeds on):
  * contiguous token spans are replaced by sentinel tokens in the INPUT,
  * and the TARGET lists each sentinel followed by the tokens it hides,
  * closed by a final sentinel.
  *
  * Deterministic distributed formulation: each token position draws the
  * engine's uniform md5 hash ([[Sampling.draw]] keyed on (doc_id, pos));
  * positions under `spanStartProb` propose a fixed-length span
  * [pos, pos+spanLen); overlapping or touching proposals merge. With
  * the defaults (p = 0.05, L = 3) the expected corrupted fraction is
  * ~p·L ≈ 15% — the T5 recipe's noise density with mean span 3.
  *
  * Scale shape — NO join anywhere: span membership, span starts, and
  * sentinel numbering are three window functions sharing ONE per-document
  * sort (`inside` = any proposal in the trailing L−1 positions, `start` =
  * inside rising edge, `k` = running start count), and the input/target
  * strings assemble via the window-ordered collection idiom
  * ([[AddLinks]]' ordering contract: running `collect_list` + group-max,
  * one sort, no lambda HOF). Work is strictly linear in corpus tokens;
  * partitioning is by document — the natural key the tokenize explode
  * already carries.
  *
  * Determinism contract: draws are md5-engine-exact, merges are pure
  * window arithmetic, and both output strings are ordered aggregations —
  * the gate oracle replays every stage with the same window frames.
  *
  * Output: (doc_id, input, target, n_spans). A document with no proposed
  * spans passes through (input = its tokens rejoined, target =
  * `<extra_id_0>` — the closing sentinel of an empty noise set);
  * zero-token documents emit input = "".
  */
object SpanCorruption {

  def corrupt(docs: DataFrame, spanStartProb: Double = 0.05,
              spanLen: Int = 3, salt: String = "t5",
              idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(spanLen >= 1, s"spanLen=$spanLen")
    require(spanStartProb >= 0 && spanStartProb <= 1,
      s"spanStartProb=$spanStartProb")
    val thr = Sampling.thresholdHex(spanStartProb)
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // positioned tokens without an interpreted HOF: 1-gram WordShingles
    // ordinals ARE the token indices (the positioned-k-gram discipline)
    val tok = docs.select(col(idCol).as("doc_id"),
      posexplode(graft.functions.WordShingles.allShingles(col(textCol), 1))
        .as(Seq("pos", "tok")))
    val staged = tok
      .withColumn("__prop",
        (Sampling.draw(concat(col("doc_id").cast("string"), lit(":"),
          col("pos").cast("string")), salt) < lit(thr)).cast("int"))
      .withColumn("__inside", max(col("__prop"))
        .over(byPos.rowsBetween(-(spanLen - 1).toLong, 0)))
      .withColumn("__start", (col("__inside") === 1 &&
        coalesce(lag(col("__inside"), 1).over(byPos), lit(0)) === 0)
        .cast("int"))
      .withColumn("__k",
        sum(col("__start")).over(
          byPos.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    val sentinel =
      concat(lit("<extra_id_"), col("__k").cast("string"), lit(">"))
    val inPiece = when(col("__start") === 1, sentinel)
      .when(col("__inside") === 1, lit(null).cast("string"))
      .otherwise(col("tok"))
    val tgtPiece = when(col("__start") === 1,
      concat(sentinel, lit(" "), col("tok")))
      .when(col("__inside") === 1, col("tok"))
      .otherwise(lit(null).cast("string"))
    // window-ordered collection: every row's array is a prefix of the
    // final one, so the group max IS the complete ordered array
    // (collect_list drops the null pieces)
    val wRun = byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDoc = staged
      .withColumn("__in_arr", collect_list(inPiece).over(wRun))
      .withColumn("__tgt_arr", collect_list(tgtPiece).over(wRun))
      .groupBy(col("doc_id"))
      .agg(max(col("__in_arr")).as("__in"),
        max(col("__tgt_arr")).as("__tgt"),
        sum(col("__start")).as("__n"))
    val closing =
      concat(lit("<extra_id_"), col("__n").cast("string"), lit(">"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(concat_ws(" ", col("__in")), lit("")).as("input"),
        when(coalesce(col("__n"), lit(0L)) > 0,
          concat(concat_ws(" ", col("__tgt")), lit(" "), closing))
          .otherwise(lit("<extra_id_0>")).as("target"),
        coalesce(col("__n"), lit(0L)).as("n_spans"))
  }

  /** Stateless streaming twin of [[corrupt]] — bit-identical output
    * (spec-enforced) with the whole computation in-row: one left fold
    * over the token array carrying (input pieces, target pieces, span
    * count, positions-since-last-proposal), so it runs UNCHANGED on an
    * unbounded append stream (no window, no state store — the
    * [[Dsir.scoreStateless]] discipline). The fold's `sincePr` counter
    * reproduces the batch path's trailing-max membership exactly:
    * s' = 0 on a proposal else s+1; inside ⇔ s' < L; a span starts on
    * the rising edge. Per-row lambda-HOF cost is the documented twin
    * trade — corpus-scale batch work stays on [[corrupt]]'s windowed
    * plan. */
  /** Independent-cropping contrastive pairs (L149) — the
    * Contriever/SimCSE-family pretraining prep (Izacard et al. 2022 §3:
    * two independently-sampled spans of one document form a positive
    * pair; everything else in the batch is a negative): per document two
    * deterministic token crops of length min(cropTokens, n), offsets
    * from independent md5 draws mod (n − L + 1), plus their token
    * overlap (the signal for filtering trivially-identical pairs).
    * Documents with no tokens emit nothing.
    *
    * Scale shape: a PURE codegen'd projection (draw → offset → slice) —
    * zero shuffle, streaming-safe by construction, the
    * [[FillInMiddle]] discipline. */
  def contrastiveCrops(docs: DataFrame, cropTokens: Int = 12,
                       salt: String = "crop", idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(cropTokens >= 1, s"cropTokens=$cropTokens")
    val toks = graft.operators.TextAnalysis.tokens(col(textCol))
    val base = docs
      .select(col(idCol).as("doc_id"), toks.as("__t"),
        size(toks).cast("long").as("__n"))
      .filter(col("__n") >= 1)
      .withColumn("__l", least(lit(cropTokens.toLong), col("__n")))
    def off(tag: String) = pmod(
      conv(Sampling.draw(col("doc_id"), salt + tag), 16, 10).cast("long"),
      col("__n") - col("__l") + 1)
    base
      .withColumn("__oa", off("a")).withColumn("__ob", off("b"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("__t"), (col("__oa") + 1).cast("int"),
          col("__l").cast("int"))).as("crop_a"),
        concat_ws(" ", slice(col("__t"), (col("__ob") + 1).cast("int"),
          col("__l").cast("int"))).as("crop_b"),
        greatest(lit(0L), least(col("__oa"), col("__ob")) + col("__l")
          - greatest(col("__oa"), col("__ob"))).as("overlap_tokens"))
  }

  def corruptStateless(docs: DataFrame, spanStartProb: Double = 0.05,
                       spanLen: Int = 3, salt: String = "t5",
                       idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(spanLen >= 1, s"spanLen=$spanLen")
    require(spanStartProb >= 0 && spanStartProb <= 1,
      s"spanStartProb=$spanStartProb")
    val thr = Sampling.thresholdHex(spanStartProb)
    val L = spanLen
    val toks = graft.functions.WordShingles.allShingles(col(textCol), 1)
    val empty = array().cast("array<string>")
    val init = struct(empty.as("in"), empty.as("tgt"),
      lit(0L).as("k"), lit(L).as("s"))
    // sequence(0, -1) DESCENDS on an empty array — guard it out
    val folded = aggregate(
      when(size(col("__toks")) > 0,
        transform(sequence(lit(0), size(col("__toks")) - 1),
          i => struct(i.as("i"),
            element_at(col("__toks"), i + 1).as("tok"))))
        .otherwise(array().cast("array<struct<i:int,tok:string>>")),
      init,
      (acc, t) => {
        val prop = Sampling.draw(
          concat(col("doc_id").cast("string"), lit(":"),
            t.getField("i").cast("string")), salt) < lit(thr)
        val s2 = when(prop, lit(0)).otherwise(acc.getField("s") + 1)
        val insidePrev = acc.getField("s") < L
        val inside = s2 < L
        val start = inside && !insidePrev
        val k2 = acc.getField("k") + when(start, 1L).otherwise(0L)
        val sentinel = concat(lit("<extra_id_"),
          (k2 - 1).cast("string"), lit(">"))
        struct(
          when(start, concat(acc.getField("in"), array(sentinel)))
            .when(inside, acc.getField("in"))
            .otherwise(concat(acc.getField("in"),
              array(t.getField("tok")))).as("in"),
          when(start, concat(acc.getField("tgt"),
            array(concat(sentinel, lit(" "), t.getField("tok")))))
            .when(inside, concat(acc.getField("tgt"),
              array(t.getField("tok"))))
            .otherwise(acc.getField("tgt")).as("tgt"),
          k2.as("k"), s2.as("s"))
      })
    docs
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .withColumn("__f", folded)
      .select(col("doc_id"),
        concat_ws(" ", col("__f.in")).as("input"),
        when(col("__f.k") > 0,
          concat(concat_ws(" ", col("__f.tgt")), lit(" <extra_id_"),
            col("__f.k").cast("string"), lit(">")))
          .otherwise(lit("<extra_id_0>")).as("target"),
        col("__f.k").as("n_spans"))
  }
}
