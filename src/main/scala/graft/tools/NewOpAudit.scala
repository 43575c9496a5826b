package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot plan audit for the round-12 additions, WITHOUT the gates'
  * checkpoint tails (PlanAudit's documented blind spot): prints the
  * executed plans of the raw unigram segment-and-count chain and the
  * raw prefix-containment pair chain so codegen spans and join
  * placement are visible. */
object NewOpAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    val toks = graft.operators.TextAnalysis
      .explodeTokens(docs, col("text"), "word", Seq(col("doc_id")))
      .filter(length(col("word")).between(1, 12) &&
        col("word").rlike("^[A-Za-z0-9]+$"))
    val seg = graft.operators.UnigramLm
      .segment(toks, Seq(("th", -1500000L), ("the", -1200000L)))
      .select(col("doc_id"), explode(col("pieces")).as("piece"))
      .groupBy(col("doc_id"), col("piece")).agg(count(lit(1)).as("n"))
    println("=== unigram segment+count ===")
    println(seg.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(20).mkString("\n"))
    val cp = graft.operators.Dedup.containmentPairsPrefix(docs, 0.6)
    println("=== containment prefix pairs ===")
    println(cp.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(40).mkString("\n"))
    // round-12 continuation: WordPiece serving chain (learn collapses to
    // driver rounds; the audit shape is the corpus-side tokenize+count)
    val wpToks = graft.operators.WordPiece.maxMatch(
      graft.operators.TextAnalysis
        .explodeTokens(docs, col("text"), "word", Seq(col("doc_id"))),
      Set("t", "##h", "##e", "th", "the"))
      .select(col("doc_id"), explode(col("pieces")).as("piece"))
      .groupBy(col("doc_id"), col("piece")).agg(count(lit(1)).as("n"))
    println("=== wordpiece maxmatch+count ===")
    println(wpToks.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(20).mkString("\n"))
    // modified-KN scoring: corpus transitions join model + model-sized
    // stat frames + one-row broadcast scalars
    val kn = graft.operators.LanguageModel.scoreDocumentsKn(
      docs, graft.operators.LanguageModel.ngramCounts(docs))
    println("=== modified-KN scoring ===")
    println(kn.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(60).mkString("\n"))
    // sample-prep trio (L81-L83): windows/projections — no join should
    // appear anywhere except span_corruption's final doc passthrough
    val sc = graft.operators.SpanCorruption.corrupt(docs)
    println("=== span corruption ===")
    println(sc.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(30).mkString("\n"))
    val cs = graft.operators.Packing.concatSlice(docs, seqLen = 32)
    println("=== concat-slice sequences ===")
    println(cs.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(30).mkString("\n"))
    val fim = graft.operators.FillInMiddle.transform(docs)
    println("=== fill-in-middle ===")
    println(fim.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(12).mkString("\n"))
    // SFT tier (L91-L96): the format is a pure projection (no exchange);
    // the packer's hop pass is one per-bucket window over the event
    // union; quantiles are one narrow agg + small-frame window; the
    // rollup is a single Expand + aggregate
    val sft = graft.operators.SftPrep.formatExamples(docs)
    println("=== sft format ===")
    println(sft.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(10).mkString("\n"))
    val lens = docs.select(col("doc_id"),
      size(graft.functions.WordShingles.allShingles(col("text"), 1))
        .cast("long").as("len"))
    val eq = graft.operators.CorpusStats.histogramQuantiles(
      lens.select(col("doc_id").cast("string").as("g"), col("len")),
      "g", "len")
    println("=== histogram quantiles ===")
    println(eq.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(16).mkString("\n"))
    val ru = graft.operators.CorpusStats.rollupReport(
      docs.select(col("lang"), col("source"), col("n_chars").as("len")),
      "lang", "source", "len")
    println("=== rollup report ===")
    println(ru.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(110)).take(12).mkString("\n"))
    spark.stop()
  }
}
