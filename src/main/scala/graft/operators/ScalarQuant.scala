package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension min-max) embedding quantization — the int8
  * compression step ANN indexes and training-data stores run before PQ is
  * worth its training cost: 4× smaller than float32 with one multiply-add
  * per dimension to reconstruct.
  *
  * Codes are 256-bucket floors: code = floor((x − mn) / (mx − mn) · 256),
  * clamped to 255 at x = mx (mn/mx the corpus-wide per-dimension extrema).
  * The floor formulation avoids round-half ties entirely, and every input
  * to it is cross-engine exact: min/max aggregation PICKS values (no
  * accumulation), and subtraction/division/scaling are single IEEE ops —
  * so codes are bit-stable across engines and cluster layouts.
  *
  * Scale shape: fit is one posexplode + groupBy(pos) aggregation —
  * map-side combined, the shuffle carries dims × partitions rows, and the
  * result is a dims-row frame. Encode COLLECTS that frame (dims-sized,
  * the config-shaped driver collect the KMeans centroid loop also uses)
  * into literal arrays and runs as a pure codegen'd projection — the
  * corpus never shuffles.
  */
object ScalarQuant {

  /** Per-dimension corpus extrema: (pos, mn, mx), dims rows. */
  def fitMinMax(vectors: DataFrame, vecCol: String = "embedding"): DataFrame =
    vectors
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Collected (mins, maxes) in dimension order — the broadcastable model. */
  def collectStats(stats: DataFrame): (Array[Double], Array[Double]) = {
    val rows = stats.select(col("pos"), col("mn"), col("mx"))
      .collect().sortBy(_.getInt(0))
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Quantization codes for one vector column given collected stats:
    * array<int> of 0..255, one per dimension. A degenerate dimension
    * (mx = mn) codes to 0. Native codegen'd kernel
    * ([[graft.functions.SqEncode]]) — the HOF shape below is the spec
    * reference it is property-checked against. */
  def encodeExpr(vec: Column, mins: Array[Double],
                 maxes: Array[Double]): Column =
    graft.functions.ScalarQuantExprs.sqEncode(vec.cast("array<double>"),
      typedlit(mins.toSeq), typedlit(maxes.toSeq))

  /** The interpreted HOF formulation of [[encodeExpr]] — per-row
    * reference semantics for the kernel's property spec only (never on a
    * corpus-wide path: CodegenFallback HOF traffic poisons shared-JVM
    * JIT profiles — see functions.SpanScrub). */
  private[graft] def encodeExprHof(vec: Column, mins: Array[Double],
                                   maxes: Array[Double]): Column = {
    val mn = typedlit(mins.toSeq)
    val mx = typedlit(maxes.toSeq)
    transform(vec.cast("array<double>"), (x, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      when(hi === lo, lit(0))
        .otherwise(least(lit(255),
          floor((x - lo) / (hi - lo) * 256.0).cast("int")))
    })
  }

  /** Midpoint reconstruction: mn + (code + 0.5) · (mx − mn) / 256 — the
    * max absolute error per dimension is (mx − mn) / 512. Native kernel
    * ([[graft.functions.SqDecode]]); HOF reference below. */
  def decodeExpr(codes: Column, mins: Array[Double],
                 maxes: Array[Double]): Column =
    graft.functions.ScalarQuantExprs.sqDecode(codes,
      typedlit(mins.toSeq), typedlit(maxes.toSeq))

  /** HOF reference twin of [[decodeExpr]] (spec-only; see
    * [[encodeExprHof]]). */
  private[graft] def decodeExprHof(codes: Column, mins: Array[Double],
                                   maxes: Array[Double]): Column = {
    val mn = typedlit(mins.toSeq)
    val mx = typedlit(maxes.toSeq)
    transform(codes, (c, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      lo + (c.cast("double") + 0.5) * (hi - lo) / 256.0
    })
  }

  /** Fit + encode in one call: the input plus a `codes` array<int> column.
    * Runs the dims-sized stats aggregation eagerly (one narrow job), then
    * encodes as a pure projection. */
  def quantize(vectors: DataFrame, vecCol: String = "embedding",
               outCol: String = "codes"): DataFrame = {
    val (mins, maxes) = collectStats(fitMinMax(vectors, vecCol))
    vectors.withColumn(outCol, encodeExpr(col(vecCol), mins, maxes))
  }

  /** Reconstruction-error report (L151) — the QA a quantized ANN tier
    * owes before int8 codes replace floats in production: per vector
    * the cosine between the original and its decode(encode(·))
    * round-trip, nano-quantized (round(cos·10⁹), the bitext_margin
    * discipline — the per-vector value is one fixed-order fold, so the
    * frame aggregates downstream in exact integers; feed `err_nano`
    * to [[CorpusStats.histogramQuantiles]] for the percentile summary).
    *
    * Scale shape: the dims-sized fit-collect (the [[quantize]]
    * boundary) + ONE pure codegen'd projection (encode → decode → fold
    * cosine) — zero shuffle past the fit. A ZERO vector has no
    * direction to preserve: its cosine is 0/0 → null (filter upstream
    * if your corpus can contain them — the [[Similarity]] cosine
    * contract). */
  def reconstructionReport(vectors: DataFrame,
                           vecCol: String = "embedding",
                           idCol: String = "vec_id"): DataFrame = {
    val (mins, maxes) = collectStats(fitMinMax(vectors, vecCol))
    val orig = col(vecCol).cast("array<double>")
    val dec = decodeExpr(encodeExpr(col(vecCol), mins, maxes), mins, maxes)
    vectors
      .select(col(idCol), orig.as("__o"), dec.as("__d"))
      .select(col(idCol),
        round(Similarity.dot(col("__o"), col("__d"))
          / (Similarity.norm(col("__o")) * Similarity.norm(col("__d")))
          * lit(1e9)).cast("long").as("cos_nano"))
      .withColumn("err_nano", lit(1000000000L) - col("cos_nano"))
  }
}
