package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.Dedup

/** Dev probe: observed dedup skew at each SF (for choosing guard caps). */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val docs = Tables.documents(spark, s"/root/testdata/sf$sf")
      println(s"SKEW sf=$sf jaccard " +
        Dedup.jaccardSkewStats(docs, 100).collect().head)
      println(s"SKEW sf=$sf lsh " +
        Dedup.lshSkewStats(docs, 100).collect().head)
    }
    spark.stop()
  }
}
