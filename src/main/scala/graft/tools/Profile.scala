package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Scratch profiling main (not part of the library surface). */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    if (sys.env.contains("SPARK_PROFILE_AQE")) b.config("spark.sql.adaptive.enabled", "true")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    time("tokens")(docs.select(explode(TextAnalysis.tokens(col("text")))).count())
    time("shingles")(docs.select(explode(Dedup.shingles(col("text"), 3))).count())
    time("postings")(Dedup.shinglePostings(docs).count())
    time("postings2")(Dedup.shinglePostings(docs).count())
    time("minhashes")(Dedup.minhashes(docs, 8).count())
    time("lsh_pairs")(Dedup.minhashLshPairs(docs).count())
    time("lsh_pairs_again")(Dedup.minhashLshPairs(docs).count())
    time("jaccard")(Dedup.jaccardPairs(docs, 0.3).count())
    val q = graft.SparkEntry.queries
    time("to_codes_noorder")(
      q("dsl_to_codes_alert")(spark, dir).queryExecution.executedPlan match {
        case _ =>
          graft.Tables.lineitem(spark, dir) // placeholder
      })
    time("to_codes_alert_full")(q("dsl_to_codes_alert")(spark, dir).count())
    time("to_codes_alert_again")(q("dsl_to_codes_alert")(spark, dir).count())
    time("dsl_value_date")(q("dsl_value_date")(spark, dir).count())
    time("dsl_to_date_between")(q("dsl_to_date_between")(spark, dir).count())
    spark.stop()
  }
}
