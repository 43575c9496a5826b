package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Diagnostic for BOTH prefix-filtered pair engines (L75 jaccard, L76
  * containment): candidate volume with and without the PPJoin filters
  * vs final pairs at a scale factor, plus the wall time of the real
  * operator calls. Uses the operators' OWN [[Dedup.prefixFrame]] /
  * [[Dedup.withRarityRanks]] / cand-condition helpers, so the
  * diagnostic cannot drift from the algorithms it measures.
  *
  * Usage: runMain graft.tools.JpProbe [sfDir] [jaccardT] [containT] */
object JpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val ct = args.lift(2).map(_.toDouble).getOrElse(0.6)
    val b = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
    graft.Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    val postings = Dedup.shinglePostings(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("g"))
      .localCheckpoint(true)
    println(s"JP postings=${postings.count()}")
    val prefix = Dedup.prefixFrame(postings, t)
    println(s"JP prefix=${prefix.count()}")
    def candCount(cond: org.apache.spark.sql.Column): Long = {
      val j = prefix.as("p1").join(prefix.as("p2"), cond)
        .select(col("p1.doc_id"), col("p2.doc_id")).distinct()
      println("JP join_plan :: " +
        j.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange"))
          .map(_.trim.take(90)).mkString(" | "))
      j.count()
    }
    println("JP cand_unfiltered=" + candCount(
      col("p1.g") === col("p2.g") && col("p1.doc_id") < col("p2.doc_id")))
    println("JP cand_filtered=" + candCount(Dedup.prefixCandCondition(t)))
    val t0 = System.nanoTime()
    val n = Dedup.jaccardPairsPrefix(docs, t).count()
    println(f"JP final=$n operator_s=${(System.nanoTime() - t0) / 1e9}%.2f")
    // ── containment (asymmetric: small-side prefix probes the full
    // ranked index). The "unfiltered" baseline is what the raw posting
    // self-join pays: every co-occurring ordered pair is a candidate.
    val ranked = Dedup.withRarityRanks(postings).localCheckpoint(true)
    println(s"CT ranked=${ranked.count()}")
    val probeF = ranked.filter(Dedup.inPrefix(ct))
    println(s"CT probe_prefix=${probeF.count()}")
    def ctCount(cond: org.apache.spark.sql.Column): Long =
      probeF.as("p1").join(ranked.as("p2"), cond)
        .select(col("p1.doc_id"), col("p2.doc_id")).distinct().count()
    val rawPairs = ranked.as("p1").join(ranked.as("p2"),
        col("p1.g") === col("p2.g") && col("p1.doc_id") < col("p2.doc_id"))
      .select(col("p1.doc_id"), col("p2.doc_id")).distinct().count()
    println(s"CT cand_posting_join=$rawPairs")
    println("CT cand_filtered=" + ctCount(Dedup.containmentCandCondition(ct)))
    val t1 = System.nanoTime()
    val cn = Dedup.containmentPairsPrefix(docs, ct).count()
    println(f"CT final=$cn operator_s=${(System.nanoTime() - t1) / 1e9}%.2f")
    spark.stop()
  }
}
