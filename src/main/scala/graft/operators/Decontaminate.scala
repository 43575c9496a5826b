package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training documents
  * that share word k-grams with an evaluation/benchmark set, so eval data
  * can be scrubbed from the training mix before a run (the standard n-gram
  * overlap decontamination described in the GPT-3/PaLM appendices; k≈13 in
  * production, smaller k for short-document corpora).
  *
  * Scale shape: the benchmark side is tiny (eval suites are thousands of
  * documents against a 100 TB corpus), so its distinct k-gram set is
  * BROADCAST; the training corpus streams its shingle postings past the
  * broadcast set in one narrow pass — no corpus-side self-join, no
  * benchmark-keyed shuffle. The only exchange is the per-document count
  * aggregation, keyed by doc id with map-side partial aggregation.
  */
object Decontaminate {

  /** The broadcast-guard metric: the benchmark's total token count — a
    * strict upper bound on its distinct gram count (every k-gram starts
    * at a token), measured with the allocation-free native counter in one
    * aggregation. Runs a Spark action (the broadcast decision can't be
    * deferred to execution) — but only ONCE per (benchmark plan, textCol):
    * the result is memoized against the DataFrame's analyzed plan, so
    * re-constructing overlap/evalReport/scrub plans over the same
    * benchmark (explain loops, scrub after overlap) pays the job once.
    * The memo holds the plan weakly — entries die with the DataFrame.
    * Staleness caveat: the key is the ANALYZED plan (structural equality),
    * not the data. If the files under a benchmark path change while an old
    * DataFrame keeps a structurally equal plan alive, a re-lookup returns
    * the count measured from the OLD data and the broadcast guard decides
    * on a stale size — acceptable for a size heuristic (mis-deciding costs
    * performance, never correctness: both join strategies are exact), but
    * drop all references to the old frame (or use a fresh session) if a
    * benchmark is rewritten in place and grows past the guard. */
  private val guardMemo = new java.util.WeakHashMap[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    Map[String, Long]]()

  private def benchTokenCount(benchmark: DataFrame, textCol: String): Long = {
    val plan = benchmark.queryExecution.analyzed
    val cached = guardMemo.synchronized {
      Option(guardMemo.get(plan)).getOrElse(Map.empty).get(textCol)
    }
    cached.getOrElse {
      // the Spark action runs OUTSIDE the lock: holding it across a job
      // would serialize every decontaminate caller in the JVM behind one
      // benchmark's aggregation (two racing callers compute twice — the
      // results are identical, last write wins)
      val n = benchmark
        .select(TextAnalysis.tokenCount(col(textCol)).cast("long").as("n"))
        .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
      guardMemo.synchronized {
        val known = Option(guardMemo.get(plan)).getOrElse(Map.empty)
        guardMemo.put(plan, known + (textCol -> n))
      }
      n
    }
  }

  /** Per-training-document contamination counts against `benchmark`.
    *
    * Output: (idCol, n_shingles, n_matched, contamination) — distinct
    * k-grams in the document, how many of those appear anywhere in the
    * benchmark set, and their ratio. Only contaminated documents
    * (n_matched > 0) are returned; the clean majority never leaves the
    * aggregation. Join keys are 64-bit xxhash64 of the k-gram — same
    * match set (collision odds ~|grams|²/2⁶⁴), a fraction of the string
    * shuffle volume.
    *
    * Short-document semantics: a document with fewer than `k` tokens
    * (including an empty/whitespace-only one) contributes ONE whole-text
    * gram, so short docs match on exact whole-text equality — and a single
    * empty benchmark row therefore flags EVERY empty training doc as 100%
    * contaminated. That is the conservative reading (an eval answer short
    * enough to fit under k grams still leaks verbatim); callers who don't
    * want empty-vs-empty matches should drop empty rows upstream, which is
    * a quality-filter decision, not a decontamination one.
    *
    * @param benchmark the eval corpus; must carry `textCol`.
    * @param maxBroadcastGrams guard on the broadcast. The guard metric is
    *        the benchmark's total TOKEN count — a one-aggregation pass
    *        over the small side, and a strict upper bound on its distinct
    *        gram count (each k-gram starts at a token) — so the expensive
    *        shingle+distinct pipeline is never computed twice. Only a
    *        benchmark under the bound is broadcast; a larger one falls
    *        back to a shuffled join instead of silently building a
    *        multi-GB broadcast relation on the driver. Conservative by
    *        construction: over-estimating gram count can only demote a
    *        broadcast to a (correct) shuffle join. The default (5M ≈ tens
    *        of MB hashed) is comfortably inside executor broadcast
    *        budgets. NOTE: the guard runs a Spark action at
    *        plan-construction time (the broadcast decision cannot be
    *        deferred); construct overlap()/scrub() plans only when you
    *        mean to run them. */
  def overlap(docs: DataFrame, benchmark: DataFrame, k: Int = 3,
              idCol: String = "doc_id", textCol: String = "text",
              maxBroadcastGrams: Long = 5000000L,
              docGrams: Option[DataFrame] = None): DataFrame = {
    // docGrams: a caller-shared [[Dedup.cacheHashedPostings]] frame
    // (doc_id, gram) covering exactly the rows of `docs` — a composed
    // pipeline that already shingled its pool for a dedup leg passes the
    // (subsetted) frame here instead of shingling the same text twice.
    val trainGrams = docGrams
      .map(_.select(col("doc_id"), col("gram").as("g")))
      .getOrElse(Dedup.shinglePostings(docs, idCol, textCol, k)
        .select(col("doc_id"), xxhash64(col("shingle")).as("g")))
    val benchGrams = Dedup.shinglePostings(benchmark, idCol, textCol, k)
      .select(xxhash64(col("shingle")).as("g")).distinct()
    val marked = benchGrams.withColumn("__hit", lit(1))
    val joined =
      if (benchTokenCount(benchmark, textCol) <= maxBroadcastGrams)
        trainGrams.join(broadcast(marked), Seq("g"), "left")
      else trainGrams.join(marked, Seq("g"), "left")
    joined
      .groupBy(col("doc_id").as(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_matched"))
      .filter(col("n_matched") > 0)
      .withColumn("contamination",
        col("n_matched").cast("double") / col("n_shingles").cast("double"))
  }

  /** The reverse report — per-BENCHMARK-item contamination: for each eval
    * document, how many training documents share at least one k-gram with
    * it and how many (train doc, gram) hits there are in total. This is
    * the view an eval owner consumes ([[overlap]] is the corpus-scrub
    * view): an eval item most of the corpus collides with is unusable
    * regardless of scrubbing and should be retired from the suite.
    *
    * Same scale shape as [[overlap]], including the broadcast guard — the
    * benchmark's (id, gram) set broadcasts only under `maxBroadcastGrams`
    * (token-count-metered; this relation keeps the bench id, so a gram
    * shared by B items appears B times — the same token-sum bound still
    * holds since each occurrence starts at a distinct (item, token)) and
    * falls back to a shuffle join past it. The only other exchange is the
    * final benchmark-id-keyed aggregation (bounded by the eval suite's
    * size). Benchmark items with zero hits are included with zero counts —
    * for an eval report, "clean" is a result, not an absence. */
  def evalReport(docs: DataFrame, benchmark: DataFrame, k: Int = 3,
                 idCol: String = "doc_id", textCol: String = "text",
                 maxBroadcastGrams: Long = 5000000L): DataFrame = {
    val trainGrams = Dedup.shinglePostings(docs, idCol, textCol, k)
      .select(col("doc_id").as("__train_id"), xxhash64(col("shingle")).as("g"))
    val benchGrams = Dedup.shinglePostings(benchmark, idCol, textCol, k)
      .select(col("doc_id").as("__bench_id"), xxhash64(col("shingle")).as("g"))
      .distinct()
    val benchSide =
      if (benchTokenCount(benchmark, textCol) <= maxBroadcastGrams)
        broadcast(benchGrams)
      else benchGrams
    val hits = trainGrams.join(benchSide, Seq("g"))
      .groupBy(col("__bench_id"))
      .agg(countDistinct(col("__train_id")).as("n_contaminating_docs"),
        count(lit(1)).as("n_shared_grams"))
    benchmark.select(col(idCol).as("__bench_id"))
      .join(hits, Seq("__bench_id"), "left")
      .select(col("__bench_id").as(idCol),
        coalesce(col("n_contaminating_docs"), lit(0L))
          .as("n_contaminating_docs"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
  }

  /** FUZZY contamination pairs — near-duplicate (training doc, benchmark
    * item) pairs that exact k-gram counting under-reports when the leak is
    * paraphrased or lightly edited: MinHash-LSH proposes candidates
    * (shared band signature — [[Dedup.minhashLshPairs]]'s scheme, applied
    * ACROSS the two frames), and every candidate pair is then verified
    * with its exact shingle-set Jaccard. "LSH recall, exact precision":
    * the output contains exactly the LSH-candidate pairs whose true
    * Jaccard reaches `threshold` — band collisions below it are filtered
    * out, near-dups the banding misses are missed (widen numHashes /
    * shrink bandSize to trade).
    *
    * Scale shape: the benchmark's band table and gram set are tiny and
    * BROADCAST (same token-count guard as [[overlap]]); the corpus pays
    * one signature aggregation, and the verify stage touches ONLY
    * candidate documents (gram postings semi-joined to the candidate id
    * set before the intersection join) — the corpus-wide gram join of the
    * exact path never runs.
    *
    * Output: (idCol, bench_id, n_common, jaccard), jaccard ≥ threshold. */
  def fuzzyOverlap(docs: DataFrame, benchmark: DataFrame,
                   threshold: Double = 0.5, numHashes: Int = 8,
                   bandSize: Int = 2, k: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text",
                   maxBroadcastGrams: Long = 5000000L): DataFrame = {
    val bcast = benchTokenCount(benchmark, textCol) <= maxBroadcastGrams
    def guard(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    def bands(src: DataFrame, outId: String): DataFrame =
      Dedup.minhashes(src, numHashes, idCol, textCol, k)
        .select(col("doc_id").as(outId),
          explode(array(Dedup.bandStructs(numHashes, bandSize): _*)).as("bs"))
        .select(col(outId), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val cand = bands(docs, "__train_id")
      .join(guard(bands(benchmark, "__bench_id")), Seq("band", "sig"))
      .select(col("__train_id"), col("__bench_id")).distinct()
    // verify: exact Jaccard over hashed distinct shingles, candidate docs only
    val tg = Dedup.shinglePostings(docs, idCol, textCol, k)
      .select(col("doc_id").as("__train_id"), xxhash64(col("shingle")).as("g"))
      .join(cand.select(col("__train_id")).distinct(), Seq("__train_id"),
        "left_semi")
    val bg = Dedup.shinglePostings(benchmark, idCol, textCol, k)
      .select(col("doc_id").as("__bench_id"), xxhash64(col("shingle")).as("g"))
    val na = tg.groupBy(col("__train_id")).agg(count(lit(1)).as("__na"))
    val nb = bg.groupBy(col("__bench_id")).agg(count(lit(1)).as("__nb"))
    val common = tg.join(guard(bg), Seq("g"))
      .groupBy(col("__train_id"), col("__bench_id"))
      .agg(count(lit(1)).as("n_common"))
      .join(cand, Seq("__train_id", "__bench_id"), "left_semi")
    common
      .join(na, Seq("__train_id"))
      .join(guard(nb), Seq("__bench_id"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("__na") + col("__nb") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("__train_id").as(idCol), col("__bench_id").as("bench_id"),
        col("n_common"), col("jaccard"))
  }

  /** The benchmark's distinct hashed k-gram set packed into ONE
    * broadcastable row — the FIT half of the stateless decontamination
    * split. Batch-compute this once per eval-suite snapshot, then gate an
    * ingest stream with [[overlapStateless]].
    *
    * SIZE CONTRACT: like [[LanguageModel]]'s packed model, the whole gram
    * set becomes one row, so it is for eval-suite-sized benchmarks (the
    * production shape: thousands of documents, well under
    * [[MaxPackedGrams]] grams ≈ hundreds of MB packed). The guard rides
    * the packing aggregation itself and fails fast with a clear message
    * instead of surfacing as an opaque single-row/broadcast OOM; corpora
    * too large to pack belong on the batch [[overlap]] join path. */
  val MaxPackedGrams: Int = 20000000

  def packedBenchGrams(benchmark: DataFrame, k: Int = 3,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    Dedup.shinglePostings(benchmark, idCol, textCol, k)
      .select(xxhash64(col("shingle")).as("g")).distinct()
      .groupBy()
      .agg(map_from_arrays(collect_list(col("g")),
        collect_list(lit(true))).as("__bg0"))
      .select(when(size(col("__bg0")) <= MaxPackedGrams, col("__bg0"))
        .otherwise(raise_error(concat(
          lit("packedBenchGrams: benchmark has "),
          size(col("__bg0")).cast("string"),
          lit(s" distinct grams, over the $MaxPackedGrams single-row " +
            "broadcast bound - use the batch overlap join path"))))
        .as("__bg"))
      .withColumn("__k", lit(1))

  /** Stateless per-row twin of [[overlap]]: contamination counts computed
    * as a pure projection over each document's own in-row gram array
    * against the batch-fitted [[packedBenchGrams]] row — no corpus-side
    * explode, no per-document aggregation, no state — so it runs
    * UNCHANGED on a streaming frame in append mode (the
    * [[Dsir.scoreStateless]] discipline: fit batch, apply stream).
    *
    * Output is every input column plus (n_shingles, n_matched,
    * contamination) for EVERY document — a streaming gate keeps or drops
    * on the ratio, and "clean" must be an answer, not an absence (the
    * batch [[overlap]] returns only contaminated docs because its
    * consumers anti-join; equivalence on the contaminated subset is
    * spec-enforced). Carry-through columns make the twin CHAINABLE — the
    * composed [[graft.streaming.CorpusStream]] pipeline threads the
    * document row through every stage. Short documents match by
    * whole-text equality, exactly as [[overlap]]. The per-row HOFs here
    * are CodegenFallback — fine per-row in a stream, which is why the
    * BATCH path keeps its explode/aggregate formulation. */
  def overlapStateless(docs: DataFrame, benchGrams: DataFrame, k: Int = 3,
                       textCol: String = "text"): DataFrame = {
    val grams = graft.functions.WordShingles.shingles(col(textCol), k)
    docs
      .withColumn("__k", lit(1))
      .join(broadcast(benchGrams), Seq("__k"))
      .withColumn("__gs", transform(grams, s => xxhash64(s)))
      .withColumn("n_shingles", size(col("__gs")).cast("long"))
      .withColumn("n_matched",
        size(filter(col("__gs"), g => element_at(col("__bg"), g).isNotNull))
          .cast("long"))
      .withColumn("contamination",
        // zero-token document → 0 grams → contamination 0.0 (clean), never
        // NULL: a null ratio would silently fail every `< max` keep-gate
        // downstream and drop the row, contradicting the "clean must be an
        // answer" contract above. (Batch overlap's short-doc fallback only
        // emits a whole-text gram when the doc has >= 1 token.)
        when(col("n_shingles") > 0,
          col("n_matched").cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)))
      .drop("__k", "__bg", "__gs")
  }

  /** The decontaminated corpus: `docs` minus every document whose k-gram
    * overlap with `benchmark` reaches `minMatched` shared k-grams. The
    * anti-join runs on ids only — document payloads never shuffle.
    * Short documents match by whole-text equality (see [[overlap]]). */
  def scrub(docs: DataFrame, benchmark: DataFrame, k: Int = 3,
            minMatched: Long = 1, idCol: String = "doc_id",
            textCol: String = "text",
            maxBroadcastGrams: Long = 5000000L): DataFrame =
    docs.join(
      overlap(docs, benchmark, k, idCol, textCol, maxBroadcastGrams)
        .filter(col("n_matched") >= minMatched).select(idCol),
      Seq(idCol), "left_anti")
}
