package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * scheme): hash every word k-gram, slide a window of `w` consecutive
  * k-gram hashes over each document, and select each window's minimum
  * hash (ties to the RIGHTMOST minimum, the paper's rule). The selected
  * (position, hash) set is the document's fingerprint sketch, with the
  * paper's guarantee: any verbatim match of at least w + k − 1 tokens
  * between two documents shares at least one selected fingerprint —
  * unlike MinHash (whole-document similarity) this DETECTS LOCAL
  * overlap, and unlike the full k-gram posting it stores ~2/(w+1) of
  * the grams.
  *
  * Reference semantics only (public paper); the reference engine's
  * fingerprint pass is `meerkat_abacus`-free — this is part of the
  * §2.8 training-data surface.
  *
  * Scale shape: gram hashing is the native codegen'd [[graft.functions
  * .Md5Prefix]] over [[graft.functions.WordShingles]] — one projection;
  * window minima are ONE doc-keyed window (frame [pos, pos+w−1]); the
  * fingerprint set is a doc-keyed distinct. Cross-doc matching buckets
  * by fingerprint VALUE with a hot-bucket guard (a fingerprint of a
  * boilerplate phrase selected by thousands of documents would go
  * quadratic — the same stop-key defense as LSH's maxBucketSize), then
  * counts shared fingerprints per pair: output-sized aggregations only.
  */
object Winnow {

  /** Rightmost-minimum selection key: min over (hash, −pos) picks the
    * smallest hash, ties to the LARGEST position. */
  private def selKey = struct(col("__h"), (-col("pos")).as("negpos"))

  /** Per-document winnowing fingerprints: (idCol, fp_pos, fp) — the
    * 0-based k-gram position and its `hexLen`-digit md5-prefix hash for
    * every selected fingerprint. Documents with fewer than k tokens have
    * no k-grams and emit nothing; documents with 1 ≤ grams < w emit the
    * minimum over their single partial window (so every doc with ≥ k
    * tokens keeps ≥ 1 fingerprint). */
  def fingerprints(docs: DataFrame, k: Int = 3, w: Int = 4,
                   idCol: String = "doc_id", textCol: String = "text",
                   hexLen: Int = 12): DataFrame = {
    require(k >= 1, s"k=$k"); require(w >= 1, s"w=$w")
    val grams = docs
      .select(col(idCol).as("doc_id"), posexplode(
        graft.functions.WordShingles.allShingles(col(textCol), k)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        graft.functions.Md5Prefix.prefix(col("col"), hexLen).as("__h"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val byDoc = Window.partitionBy(col("doc_id"))
    grams
      .withColumn("__sel", min(selKey).over(frame))
      .withColumn("__n", count(lit(1)).over(byDoc))
      // complete windows only — plus the single partial window at pos 0
      // for documents with fewer than w grams
      .filter(col("pos") <= col("__n") - w ||
        (col("__n") < w && col("pos") === 0))
      .select(col("doc_id").as(idCol),
        (-col("__sel.negpos")).as("fp_pos"), col("__sel.__h").as("fp"))
      .distinct()
  }

  /** Stateless PER-ROW twin of [[fingerprints]]: each document's selected
    * fingerprint set as an in-row array of (fp_pos, fp) structs — a pure
    * projection with no window, explode, or state, so it runs UNCHANGED
    * on a streaming frame in append mode (the
    * [[Decontaminate.overlapStateless]] discipline). The per-row HOFs
    * here are CodegenFallback — fine per-row in a stream, which is why
    * the BATCH path keeps its window formulation. Equivalence to the
    * batch operator's per-doc set is spec-pinned.
    *
    * A streaming ingest gate matches the arriving document's `out` array
    * against a batch-fitted hot-fingerprint table (broadcast) the same
    * way the stateless decontaminator probes its packed gram set. */
  def fingerprintsStateless(docs: DataFrame, k: Int = 3, w: Int = 4,
                            textCol: String = "text",
                            out: String = "fps",
                            hexLen: Int = 12): DataFrame = {
    require(k >= 1, s"k=$k"); require(w >= 1, s"w=$w")
    val hs = transform(
      graft.functions.WordShingles.allShingles(col(textCol), k),
      g => graft.functions.Md5Prefix.prefix(g, hexLen))
    docs
      .withColumn("__hs", hs)
      .withColumn("__ng", size(col("__hs")))
      // window starts: complete windows, or the single partial window at
      // 0 when fewer than w grams exist (matching the batch filter)
      .withColumn("__starts",
        when(col("__ng") === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(0),
            greatest(col("__ng") - w, lit(0)).cast("int"))))
      .withColumn(out, array_distinct(transform(col("__starts"), s => {
        // rightmost minimum over window [s, min(s+w, ng)): fold the
        // window's indices, carrying (best hash, best pos)
        val win = sequence(s, least(s + w - 1, col("__ng") - 1))
        aggregate(win,
          struct(lit(Long.MaxValue).as("fp"), lit(-1L).as("fp_pos")),
          (acc, i) => {
            val h = element_at(col("__hs"), i + 1)
            when(h < acc.getField("fp") ||
                (h === acc.getField("fp") &&
                  i.cast("long") > acc.getField("fp_pos")),
              struct(h.as("fp"), i.cast("long").as("fp_pos")))
              .otherwise(acc)
          },
          acc => struct(acc.getField("fp_pos").as("fp_pos"),
            acc.getField("fp").as("fp")))
      })))
      .drop("__hs", "__ng", "__starts")
  }

  /** Cross-document fingerprint matches: (doc_a, doc_b, n_shared) pairs
    * (a < b) sharing at least `minShared` DISTINCT fingerprint values.
    * By the winnowing guarantee a pair with any verbatim overlap of
    * ≥ w + k − 1 tokens appears here (with minShared = 1).
    *
    * `maxBucketSize` drops fingerprint values selected by more distinct
    * documents than the bound before pairing — the boilerplate-phrase /
    * stop-fingerprint defense; `None` disables. */
  def matchPairs(fps: DataFrame, minShared: Long = 1,
                 maxBucketSize: Option[Int] = Some(64),
                 idCol: String = "doc_id"): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared")
    val docFp = fps.select(col(idCol).as("__id"), col("fp")).distinct()
    val guarded = maxBucketSize match {
      case Some(m) =>
        require(m >= 2, s"maxBucketSize=$m")
        val hot = docFp.groupBy(col("fp"))
          .agg(count(lit(1)).as("__nd")).filter(col("__nd") > m)
          .select(col("fp"))
        docFp.join(hot, Seq("fp"), "left_anti")
      case None => docFp
    }
    val a = guarded.select(col("fp"), col("__id").as("doc_a"))
    val b = guarded.select(col("fp"), col("__id").as("doc_b"))
    a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
