package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.BpeLearn

/** Production-scale sizing probe for [[graft.operators.BpeLearn
  * .learnBatched]]: run a 30k-merge vocabulary build over the sf word
  * table at several batch sizes and report, per batch size —
  *
  *   - wall seconds and merges actually learned (the corpus saturates
  *     when no disjoint pair clears `minFrequency`; where that happens
  *     is itself a datum),
  *   - driver round-trips (= rounds: one pair-count collect + one
  *     checkpointed re-segmentation each),
  *   - batch acceptance rate (accepted / asked per round, averaged) —
  *     how much of each round's ask survives the symbol-disjointness
  *     greedy scan,
  *   - seconds per merge and per round.
  *
  * Not a gate (the batched path's ORACLE gate is `bpe_merges_batched`
  * at 8 merges / batch [4,4]); this is the evidence behind the
  * scaladoc's production claim that batching makes 30k-merge
  * vocabularies practical. Findings land in NOTES.md.
  *
  * VOCABULARY EXPANSION: the synthetic documents corpus draws from only
  * ~31 distinct words, which saturates BPE after ~100 merges — useless
  * for sizing a 30k-merge build. The probe therefore expands the
  * vocabulary DETERMINISTICALLY FROM THE DATA: each token occurrence is
  * suffixed with `_<xxhash64(word, doc_id) % expand>`, yielding an
  * `expand`-times larger vocabulary with the corpus's own frequency
  * mass spread across it. Batch mechanics — candidate aggregation cost,
  * greedy acceptance rate, re-segmentation pass cost, driver
  * round-trips — depend on vocabulary size and word length, not on the
  * words being natural language, so the measured curve transfers.
  *
  * Usage: runMain graft.tools.BpeSizing [sfDir] [maxMerges] [batchSizes] [expand]
  *        (defaults: /root/testdata/sf0.1 30000 64,256,1024 2000)
  */
object BpeSizing {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxMerges = args.lift(1).map(_.toInt).getOrElse(30000)
    val batchSizes = args.lift(2).getOrElse("64,256,1024")
      .split(",").map(_.trim.toInt).toSeq
    val expand = args.lift(3).map(_.toInt).getOrElse(2000)
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("w"), col("doc_id"))
      .filter(col("w") =!= "")
      .select(concat(col("w"), lit("_"),
        pmod(xxhash64(col("w"), col("doc_id")), lit(expand.toLong)))
        .as("text"))
      .localCheckpoint(true)
    val nWords = BpeLearn.wordFrequencies(docs).count()
    println(s"BPE_SIZING sf=$sfDir distinct_words=$nWords max_merges=$maxMerges expand=$expand")
    // arg 5: comma list of paths to time per batch size — "batched"
    // (full per-round pair re-aggregation) and/or "incremental"
    // (delta-maintained pair frame, r13); merge sequences are asserted
    // identical when both run
    val paths = args.lift(4).getOrElse("batched")
      .split(",").map(_.trim).toSeq
    batchSizes.foreach { bs =>
      val results = paths.map { path =>
        var rounds = 0
        var asked = 0L
        var accepted = 0L
        val onRound = (_: Int, want: Int, got: Int) => {
          rounds += 1; asked += want; accepted += got
          if (rounds % 25 == 0)
            System.err.println(s"[bpe] path=$path batch=$bs round=$rounds merges=$accepted")
        }
        val t0 = System.nanoTime()
        val merges = path match {
          case "incremental" =>
            BpeLearn.learnBatchedIncremental(docs, maxMerges, bs,
              onRound = onRound)
          case _ =>
            BpeLearn.learnBatched(docs, maxMerges, bs, onRound = onRound)
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val accRate = if (asked == 0) 0.0 else accepted.toDouble / asked
        println(f"BPE_SIZING path=$path%-11s batch=$bs%-5d merges=${merges.length}%-6d rounds=$rounds%-5d " +
          f"wall_s=$secs%8.1f s_per_round=${secs / math.max(1, rounds)}%6.2f " +
          f"s_per_merge=${secs / math.max(1, merges.length)}%8.4f acceptance=$accRate%5.2f " +
          f"saturated=${merges.length < maxMerges}")
        merges
      }
      if (results.size == 2)
        println(s"BPE_SIZING batch=$bs merge_sequences_identical=${results(0) == results(1)}")
    }
    spark.stop()
  }
}
