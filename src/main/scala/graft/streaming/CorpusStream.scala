package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, LanguageModel, Packing, TextAnalysis,
  TextNormalize, UrlOps}

/** The COMPOSED streaming twin of the batch curation pipeline (the
  * oracle-gated `corpus_pipeline` chain): every stage of the streamable
  * subset wired as ONE append-mode plan over batch-fitted models —
  *
  *   URL canonicalize → mojibake repair → language id → Gopher quality
  *   filter → stateless decontamination → stateless boilerplate scrub →
  *   stateless CCNet perplexity buckets → stateless epoch order keys
  *
  * The fit/apply split is the production arrangement: corpus-wide state
  * (benchmark gram sets, site boilerplate templates, the LM and its
  * per-language tercile cuts) comes from a BATCH pass over a crawl
  * snapshot; the stream applies those frozen fits as pure projections and
  * broadcast joins — no watermark, no stream-side aggregation, no state
  * store — so a drained stream is row-for-row identical to the batch
  * composition over the same documents (spec-enforced). The batch-only
  * stages of the full pipeline (near-dup pair generation, connected
  * components, keep-best, temperature mix, packing ranks) are exactly the
  * ones whose semantics REQUIRE corpus-wide visibility; their streaming
  * counterpart is refitting on the next snapshot.
  *
  * Stream-side cost per document is one pass of each projection plus
  * three one-row broadcast joins (gram set, template map, packed LM) and
  * one broadcast equi-join (cuts) — at 100 TB/day ingest the per-executor
  * working set is the fits, which are eval-suite / site-template /
  * snapshot-LM sized by the packing guards on each fit.
  *
  * Input schema contract: (doc_id, lang, url, text) — the documents-table
  * convention the batch pipeline reads.
  */
object CorpusStream {

  /** The frozen batch fits the stream consumes. Build with [[fit]] (or
    * assemble from the individual fit operators); each frame should be
    * materialized (checkpoint / parquet) so micro-batches re-read a
    * snapshot instead of re-running the fit query. */
  final case class Fitted(benchGrams: DataFrame, templates: DataFrame,
                          lmModel: DataFrame, cuts: DataFrame)

  /** Batch-fit every model the stream needs, each eagerly checkpointed:
    * the benchmark's packed gram set, boilerplate templates over the
    * CURATED pool (scrub is fitted downstream of decontamination in the
    * batch chain, so fit it on the post-filter survivors the caller
    * passes), and the LM + tercile cuts over the scrubbed text. */
  def fit(curatedPool: DataFrame, benchmark: DataFrame, k: Int = 3,
          maxDocShare: Double = 0.5, minDomainDocs: Long = 5,
          domainCol: String = "domain"): Fitted = {
    val grams = Decontaminate.packedBenchGrams(benchmark, k)
      .localCheckpoint(true)
    val templates = TextNormalize.boilerplateTemplates(curatedPool,
        maxDocShare, minDomainDocs, domainCol = domainCol)
      .localCheckpoint(true)
    val scrubbed = TextNormalize.scrubBoilerplateStateless(curatedPool,
      templates, domainCol = domainCol)
    val model = LanguageModel.ngramCounts(scrubbed).localCheckpoint(true)
    val cuts = LanguageModel.perplexityCuts(scrubbed, model)
      .localCheckpoint(true)
    Fitted(grams, templates, model, cuts)
  }

  /** The chain. Append-safe end to end: every stage is a projection or a
    * stream-static broadcast join. Rows drop at the Gopher gate, the
    * contamination gate, and the bucket stage's zero-transition filter
    * (single-token documents have no bigram to score — the batch
    * pipeline's documents are past the Gopher length floor by then, so
    * this drops nothing in practice).
    *
    * Output: doc_id, lang, domain, text (repaired + scrubbed), plang,
    * contamination, n_lines, n_removed, ppx, bucket, order_key. */
  def curate(stream: DataFrame, fits: Fitted, k: Int = 3,
             minWords: Int = 50, maxWords: Int = 100000,
             contaminationMax: Double = 0.2,
             epochSalt: String = ""): DataFrame = {
    // stages 1-2: registered domain off the canonicalized URL; mojibake
    // repair feeds every later stage
    val fixed = stream.select(col("doc_id"), col("lang"),
      UrlOps.registeredDomain(UrlOps.host(col("url"))).as("domain"),
      TextNormalize.fixMojibake(col("text")).as("text"))
    // stage 3: language id over the repaired text (bound token column —
    // HOF lambdas don't CSE)
    val langed = fixed
      .withColumn("__lt", TextAnalysis.tokens(lower(col("text"))))
      .withColumn("plang", TextAnalysis.predictedLangFromTokens(col("__lt")))
      .drop("__lt")
    // stage 4: Gopher battery in-row; survivors continue
    val gated = langed
      .withColumn("__keep", TextAnalysis
        .gopherColumns(col("text"), minWords, maxWords)
        .toMap.apply("gopher_keep"))
      .filter(col("__keep"))
      .drop("__keep")
    // stage 5: stateless decontamination against the packed benchmark
    val clean = Decontaminate.overlapStateless(gated, fits.benchGrams, k)
      .filter(col("contamination") < contaminationMax)
      .drop("n_shingles", "n_matched")
    // stage 6: stateless boilerplate scrub under the fitted templates
    val scrubbed = TextNormalize.scrubBoilerplateStateless(clean,
      fits.templates, domainCol = "domain")
    // stage 7: stateless CCNet buckets under the fitted LM + cuts
    val bucketed = LanguageModel.bucketsStateless(scrubbed, fits.lmModel,
      fits.cuts)
    // stage 8: stateless epoch order keys
    Packing.epochOrderStateless(bucketed, keyCol = "doc_id",
      salt = epochSalt)
  }
}
