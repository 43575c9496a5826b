package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.config._
import graft.functions.MapResolver
import graft.operators._

/** Dev probe: generated-code volume of catalog slices. */
object ChunkProbe {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val codesDir = "/root/reference/meerkat_abacus/country_config/variable_codes"
    val catalog = CodesCsv.load(spark,
      s"$codesDir/demo_codes.csv", s"$codesDir/demographic_codes.csv")
    val form = spark.read.parquet("/tmp/graft_demo_e2e_form_100000")
    val caseCodes = catalog.filter(c => c.typ == "case" && c.multipleLink.isEmpty)
    import org.apache.spark.sql.execution.debug._
    // per-code generated volume: codegen each code alone, then slices
    for (slice <- Seq(caseCodes.slice(0, 10), caseCodes.slice(10, 20),
         caseCodes.slice(20, 40), caseCodes.slice(0, 40))) {
      val coded = ToCodes(form, slice, new MapResolver(col("data")),
        graft.functions.EpiWeek.StartDay(0))
      val codes = coded.queryExecution.executedPlan // build
      val pairs = org.apache.spark.sql.execution.debug.codegenStringSeq(
        coded.queryExecution.executedPlan)
      println(s"SLICE n=${slice.length} stages=${pairs.length} " +
        s"codeLens=${pairs.map(_._2.length).mkString(",")}")
    }
    // find the fattest individual codes
    val fat = caseCodes.map { c =>
      val coded = ToCodes(form, Seq(c), new MapResolver(col("data")),
        graft.functions.EpiWeek.StartDay(0))
      val pairs = org.apache.spark.sql.execution.debug.codegenStringSeq(
        coded.queryExecution.executedPlan)
      (c.id, pairs.map(_._2.length).sum)
    }.sortBy(-_._2)
    println("FATTEST: " + fat.take(12).mkString(" "))
    println("TOTAL: " + fat.map(_._2).sum)
    spark.stop()
  }
}
