package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{QualityModel, TextAnalysis}

/** Stage-level timing for the quality_lr gate: feature build vs train vs
  * score. Dev harness (not part of the driver contract). */
object QualityLrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val docs = Tables.documents(spark, sfDir)
      val label =
        size(filter(TextAnalysis.tokens(col("text")), _ === "spark")) >= 2
      val feats = time("features") {
        QualityModel.features(docs, buckets = 8, labelExpr = label)
          .localCheckpoint(true)
      }
      val w = time("train") {
        QualityModel.train(feats, buckets = 8, iters = 8, lr = 4.0)
      }
      time("score") {
        QualityModel.score(feats, w, buckets = 8)
          .localCheckpoint(true).orderBy(col("doc_id"))
          .queryExecution.toRdd.count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
