package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Stage-level timing probe for the jaccard near-dup pipeline — where does
  * `dedup_jaccard`'s wall time go at a given SF? Each step is timed twice
  * (warm JIT) over the same session.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.JaccardProbe
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      f // warm
      // drop any INTERNAL persists the warm pass left (jaccardPairs caches
      // its posting lists) — otherwise the timed pass reads the warm run's
      // cache and understates exactly the expensive stages
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      spark.catalog.clearCache()
    }

    val docs = Tables.documents(spark, sfDir)
    time("scan")(docs.count())
    time("tokens") {
      docs.select(TextAnalysis.tokens(col("text")).as("t"))
        .agg(sum(size(col("t")))).head().getLong(0)
    }
    time("postings") {
      Dedup.shinglePostings(docs)
        .select(col("doc_id"), xxhash64(col("shingle")).as("h")).count()
    }
    time("postings+guardWindow") {
      val raw = Dedup.shinglePostings(docs)
        .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      raw.withColumn("df", count(lit(1)).over(w))
        .filter(col("df") <= 1000).count()
    }
    time("byShingleAgg") {
      Dedup.shinglePostings(docs)
        .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
        .groupBy("h").agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) <= 1000).count()
    }
    time("fullJaccard") {
      Dedup.jaccardPairs(docs, 0.3, maxShingleDf = Some(1000)).count()
    }
    time("fullComponents") {
      val jp = Dedup.jaccardPairs(docs, 0.3, maxShingleDf = Some(1000))
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      Dedup.connectedComponents(jp).count()
    }
    spark.stop()
  }
}
