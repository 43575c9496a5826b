package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-duplication (the multimodal operator tier
  * above [[Multimodal]]'s decode plumbing): aHash / dHash over a decoded
  * luma grid, then banded bucket-join pair generation — the same
  * candidates-never-all-pairs engine shape as
  * [[Dedup.minhashLshPairs]], with an EXACTNESS guarantee the MinHash
  * engine doesn't have: with `numBands` bands over the hash bits, any
  * pair within Hamming radius `numBands - 1` shares at least one
  * identical band (pigeonhole), so candidate generation is recall-1.0
  * for the verified radius and the exact per-pair Hamming verification
  * makes the whole engine exact.
  *
  * Everything is integer arithmetic over integer pixel values — block
  * sums, floor-division means, threshold bits, 16-bit band packing —
  * so a SQL oracle recomputes the hashes bit-for-bit from the same
  * pixel table ("oracle-able over a pre-decoded pixel table the way
  * embeddings are gated": the pixel decode itself is [[Multimodal]]'s
  * job; this operator starts where a luma raster already sits in a
  * column).
  *
  * PRODUCTION PATH: the hash builders here ([[ahashBands]] /
  * [[dhashBands]] / [[lumaCells]]) are the readable HOF REFERENCE
  * shape — HOF lambdas are CodegenFallback and don't CSE, so every
  * hash bit re-evaluates the whole cell array (~10⁴ interpreted node
  * evals per row; 135 s for 5 000 rows, measured). Corpus-scale
  * hashing goes through the native codegen'd kernel
  * [[graft.functions.PhashExprs]] (one O(pixels) pass, spec-pinned
  * bit-identical to these builders); [[nearDupPairs]] consumes either.
  * If the HOF shape must run, pass `pixels` as a MATERIALIZED column —
  * an inlined pixel-expression alias is recomputed per reference.
  *
  * Scale shape: hashing is a pure per-row projection (zero shuffle);
  * pair generation explodes each image into `numBands` (band, value)
  * rows, self-joins band buckets (equi-join — never all pairs), and
  * verifies candidates with an in-row popcount. Hot buckets (flat
  * regions hashing to the same band value corpus-wide) are the skew
  * risk, capped by `maxBucketSize` exactly like every other pair
  * engine's hot-key guard.
  */
object PerceptualHash {

  /** Integer floor division for non-negative operands; exact (a double
    * correctly-rounded quotient of exact small integers floors right,
    * and these operands are pixel-bounded). */
  private def idiv(a: Column, b: Long): Column =
    floor(a / lit(b.toDouble)).cast("long")

  /** Grid of block-mean luma cells: `pixels` is a row-major
    * `array<bigint>` raster of `w`×`h` values, reduced to a
    * `grid`×`grid` array of floor-mean cells (cell c = mean of its
    * (w/grid)×(h/grid) block). Pure in-row projection. */
  def lumaCells(pixels: Column, w: Int, h: Int, grid: Int = 8): Column = {
    require(w > 0 && h > 0 && grid > 0, s"w=$w h=$h grid=$grid")
    require(w % grid == 0 && h % grid == 0,
      s"grid $grid must divide width $w and height $h " +
        "(resample upstream for non-integral blocks)")
    val bw = w / grid
    val bh = h / grid
    transform(sequence(lit(0L), lit((grid * grid - 1).toLong)), c => {
      val cy = idiv(c, grid)
      val cx = c % grid
      val blockSum = aggregate(
        sequence(lit(0L), lit((bw * bh - 1).toLong)), lit(0L),
        (acc, i) => {
          val py = cy * bh + idiv(i, bw)
          val px = cx * bw + (i % bw)
          acc + element_at(pixels, (py * w + px + 1).cast("int"))
        })
      idiv(blockSum, (bw * bh).toLong)
    })
  }

  /** Average hash (aHash): cells thresholded at the grid's own
    * floor-mean, MSB-first packed into `grid²/bandBits` band values
    * (each < 2^bandBits, so no 64-bit sign traffic anywhere — the bands
    * are ALSO the LSH bucketing unit for [[nearDupPairs]]).
    * Returns `array<bigint>` of band values. */
  def ahashBands(pixels: Column, w: Int, h: Int, grid: Int = 8,
                 bandBits: Int = 16): Column = {
    val nBits = grid * grid
    require(nBits % bandBits == 0, s"bandBits $bandBits must divide $nBits")
    val cells = lumaCells(pixels, w, h, grid)
    val mean = idiv(aggregate(cells, lit(0L), _ + _), nBits.toLong)
    transform(sequence(lit(0L), lit((nBits / bandBits - 1).toLong)), b =>
      aggregate(sequence(lit(0L), lit((bandBits - 1).toLong)), lit(0L),
        (acc, j) => acc * 2 +
          when(element_at(cells, (b * bandBits + j + 1).cast("int")) >= mean,
            1L).otherwise(0L)))
  }

  /** Difference hash (dHash), horizontal-gradient-with-wrap variant:
    * bit(r, c) = cell(r, c) > cell(r, (c+1) mod grid). The canonical
    * dHash resamples to (grid+1)×grid so the last column has a right
    * neighbour; an integer block grid can't produce 9 columns from
    * every raster width, so the wrap variant keeps the gradient
    * semantics AND the integer-exact (oracle-able) arithmetic — the
    * bit count and banding contract are identical. */
  def dhashBands(pixels: Column, w: Int, h: Int, grid: Int = 8,
                 bandBits: Int = 16): Column = {
    val nBits = grid * grid
    require(nBits % bandBits == 0, s"bandBits $bandBits must divide $nBits")
    val cells = lumaCells(pixels, w, h, grid)
    transform(sequence(lit(0L), lit((nBits / bandBits - 1).toLong)), b =>
      aggregate(sequence(lit(0L), lit((bandBits - 1).toLong)), lit(0L),
        (acc, j) => {
          val bitIdx = b * bandBits + j // = r*grid + c
          val r = idiv(bitIdx, grid)
          val c = bitIdx % grid
          val cur = element_at(cells, (r * grid + c + 1).cast("int"))
          val nxt = element_at(cells,
            (r * grid + (c + 1) % grid + 1).cast("int"))
          acc * 2 + when(cur > nxt, 1L).otherwise(0L)
        }))
  }

  /** Exact per-pair Hamming distance between two band arrays — in-row
    * popcount of the bandwise XOR, no bit materialization. */
  def hamming(bandsA: Column, bandsB: Column): Column =
    aggregate(zip_with(bandsA, bandsB,
      (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")), lit(0L), _ + _)

  /** Near-duplicate image pairs within `maxHamming` bits: band-bucketed
    * candidate generation (equi-join on (band index, band value)) +
    * exact Hamming verification. EXACT for `maxHamming <= numBands - 1`
    * (pigeonhole: ≤ maxHamming differing bits cannot touch all
    * `numBands` bands, so some band matches verbatim and the pair IS a
    * candidate); larger radii need more/narrower bands — the require
    * makes the recall contract explicit instead of silently partial.
    *
    * `imgs` carries `idCol` and `bandsCol` (an [[ahashBands]] /
    * [[dhashBands]] array). `maxBucketSize` is the hot-bucket guard
    * (posting-list formulation, the [[Dedup.minhashLshPairs]] idiom):
    * a band value shared by more than `cap` images — monochrome
    * thumbnails, template frames — is a stop-bucket whose quadratic
    * pair blow-up is skipped; None = unguarded self-join.
    *
    * Output: (doc_a, doc_b, hamming), doc_a < doc_b, hamming ≤
    * maxHamming. */
  def nearDupPairs(imgs: DataFrame, idCol: String = "doc_id",
                   bandsCol: String = "bands", numBands: Int = 4,
                   maxHamming: Int = 3,
                   maxBucketSize: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0, s"maxHamming=$maxHamming")
    require(maxHamming <= numBands - 1,
      s"maxHamming=$maxHamming needs > $maxHamming bands for exact " +
        s"candidate recall; got numBands=$numBands")
    val rows = imgs.select(col(idCol).as("doc_id"),
      col(bandsCol).as("__bands"),
      posexplode(col(bandsCol)).as(Seq("__bi", "__bv")))
    val joined = maxBucketSize match {
      case Some(cap) =>
        rows.groupBy(col("__bi"), col("__bv"))
          .agg(collect_list(struct(col("doc_id"), col("__bands"))).as("__ds"))
          .filter(size(col("__ds")) <= cap)
          .select(explode(col("__ds")).as("__a"), col("__ds"))
          .select(col("__a"), explode(col("__ds")).as("__b"))
          .filter(col("__a.doc_id") < col("__b.doc_id"))
          .select(col("__a.doc_id").as("doc_a"),
            col("__b.doc_id").as("doc_b"),
            col("__a.__bands").as("__ba"), col("__b.__bands").as("__bb"))
      case None =>
        val a = rows.select(col("doc_id").as("doc_a"),
          col("__bands").as("__ba"), col("__bi"), col("__bv"))
        val b = rows.select(col("doc_id").as("doc_b"),
          col("__bands").as("__bb"), col("__bi"), col("__bv"))
        a.join(b, Seq("__bi", "__bv"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"), col("__ba"), col("__bb"))
    }
    joined
      .withColumn("hamming", hamming(col("__ba"), col("__bb")))
      .filter(col("hamming") <= maxHamming)
      // a pair can match in several bands — one row per pair
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("hamming")).as("hamming"))
  }
}
