package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-principal-direction estimation and removal over an embedding
  * column — the "All-but-the-Top" post-processing (Mu & Viswanath 2018,
  * ICLR: embedding sets share a large common direction; removing the
  * mean and the top principal component(s) measurably improves
  * similarity tasks). The fit is POWER ITERATION over the centered
  * vectors, run entirely in INTEGER fixed point (the
  * [[LinkGraph]]/PageRank determinism discipline): floats quantize once
  * at ingestion (floor(v·10⁹)), every division is the TRUNCATING
  * integer division both engines share (Spark `div` and DuckDB `//`
  * both round toward zero on signed values — verified, not assumed),
  * and each round
  * re-normalizes by the max-|component| instead of the L2 norm — no
  * sqrt, no per-round float anywhere, so the whole trajectory is
  * engine-exact and the direction gate hashes bit-for-bit.
  *
  * Scale shape: centering is one (pos)-keyed aggregation; each round is
  * one (pos)-keyed broadcast join + vec-keyed aggregation (the dot
  * products), one vec-keyed join + (pos)-keyed aggregation (the
  * mat-vec), and a one-row max — the PageRank shape over a frame that is
  * (vectors × dims) rows. Arithmetic headroom: the mat-vec sum is
  * bounded by N · 6.4·10⁴ · 10⁹ ≈ N·6.4·10¹³, safe to N ≈ 10⁵ vectors —
  * past that, fit on a deterministic hash sample (the standard practice
  * for embedding post-processing: the top direction is estimated, the
  * REMOVAL applies to every vector).
  */
object EmbeddingPca {

  /** Truncating integer division of column exprs (den > 0) — Spark's
    * `div`, which DuckDB's `//` matches exactly on signed values. */
  private def fdiv(num: String, den: String): Column =
    expr(s"($num) div ($den)")

  /** The centered integer frame: (vec_id, pos, u) with u =
    * floor(v·10⁹) − floor-mean — exact integers, 10⁹ scale. */
  def centeredInt(vectors: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val vInt = vectors.select(col(idCol).as("vec_id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "__v")))
      .withColumn("__vi", floor(col("__v") * lit(1e9)).cast("long"))
    val mean = vInt.groupBy(col("pos"))
      .agg(sum(col("__vi")).as("__s"), count(lit(1)).as("__n"))
      .select(col("pos"), fdiv("__s", "__n").as("__mu"))
    vInt.join(broadcast(mean), Seq("pos"))
      .select(col("vec_id"), col("pos"), (col("__vi") - col("__mu")).as("u"))
  }

  /** The top principal direction after `iters` integer power-iteration
    * rounds from x₀ = e₀: (pos, pc_micro), infinity-norm-normalized
    * (max |component| ≈ 10⁶; sign follows the deterministic
    * trajectory). Degenerate input (all vectors equal) yields the zero
    * direction. */
  def topComponent(vectors: DataFrame, iters: Int = 4,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, s"iters=$iters")
    val u = centeredInt(vectors, idCol, vecCol).localCheckpoint(true)
    var x = u.select(col("pos")).distinct()
      .select(col("pos"),
        when(col("pos") === 0, lit(1000000L)).otherwise(lit(0L)).as("x"))
      .localCheckpoint(true)
    var it = 0
    while (it < iters) {
      // d_i = floor((u_i · x) / 10¹²): 10⁹·10⁶-scale dots to ~10³ scale —
      // bounds the mat-vec below; power iteration self-corrects the
      // truncation (the trajectory, not the precision, is the contract)
      val d = u.join(broadcast(x), Seq("pos"))
        .groupBy(col("vec_id"))
        .agg(sum(col("u") * col("x")).as("__dn"))
        .select(col("vec_id"), fdiv("__dn", "1000000000000").as("__d"))
      val y = u.join(d, Seq("vec_id"))
        .groupBy(col("pos")).agg(sum(col("__d") * col("u")).as("__y"))
      val s = y.agg(greatest(lit(1L),
        fdiv("max(abs(__y))", "1000000")).as("__s"))
      x = y.crossJoin(broadcast(s))
        .select(col("pos"), fdiv("__y", "__s").as("x"))
        .localCheckpoint(true)
      it += 1
    }
    x.select(col("pos"), col("x").as("pc_micro"))
  }

  /** Per-vector projection COEFFICIENT onto a fitted [[topComponent]]
    * direction — the scalar c with u∥ = c·x (x in its micro scale), in
    * MICRO units: c_micro = floor((Σ u·x)·10³ / |x|²) staged through
    * floor divisions so every intermediate stays under 2⁶³. This is the
    * magnitude "all-but-the-top" subtracts; [[removeTop]] applies it. */
  def projections(vectors: DataFrame, pc: DataFrame,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val u = centeredInt(vectors, idCol, vecCol)
    val xn = pc.agg(sum(col("pc_micro") * col("pc_micro")).as("__xn2"))
    u.join(broadcast(pc), Seq("pos"))
      .groupBy(col("vec_id"))
      .agg(sum(col("u") * col("pc_micro")).as("__pf"))
      .crossJoin(broadcast(xn))
      // c_micro = pf·10³/xn2 computed as (pf div 10⁶)·10³/(xn2 div 10⁶):
      // pf ≤ 6.4·10¹⁶ → p6 ≤ 6.4·10¹⁰, ·10³ = 6.4·10¹³ — safe
      .select(col("vec_id"),
        fdiv("__pf", "1000000").as("__p6"),
        greatest(lit(1L), fdiv("__xn2", "1000000")).as("__x6"))
      .select(col("vec_id"), fdiv("__p6 * 1000", "__x6").as("coef_micro"))
  }

  /** The corrected frame — every vector with its top-direction
    * component removed: (vec_id, pos, u_corrected) at 10⁹ scale,
    * u' = u − floor((pf div 10⁶)·x / (|x|² div 10⁶)) — the same staged
    * arithmetic as [[projections]] applied per component. Spec-pinned
    * property: re-projecting the corrected frame onto the same
    * direction is ~0. */
  def removeTop(vectors: DataFrame, pc: DataFrame,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val u = centeredInt(vectors, idCol, vecCol)
    val xn = pc.agg(greatest(lit(1L),
      fdiv("sum(pc_micro * pc_micro)", "1000000")).as("__x6"))
    val pf = u.join(broadcast(pc), Seq("pos"))
      .groupBy(col("vec_id"))
      .agg(sum(col("u") * col("pc_micro")).as("__pf"))
      .select(col("vec_id"), fdiv("__pf", "1000000").as("__p6"))
    u.join(pf, Seq("vec_id"))
      .join(broadcast(pc), Seq("pos"))
      .crossJoin(broadcast(xn))
      .select(col("vec_id"), col("pos"),
        (col("u") - fdiv("__p6 * pc_micro", "__x6")).as("u_corrected"))
  }
}
