package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.config._
import graft.functions.MapResolver
import graft.operators._

object Isolate {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"ISO $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val codesDir = "/root/reference/meerkat_abacus/country_config/variable_codes"
    val catalog = CodesCsv.load(spark,
      s"$codesDir/demo_codes.csv", s"$codesDir/demographic_codes.csv")
    val form = spark.read.parquet(s"/tmp/graft_demo_e2e_form_$n")
    time("form.count")(form.count())
    val qc = QualityControl(form, QualityControlDef(qcCodes = Seq(
      CodeDef(id = "qc_height", method = "between", condition = "50,220",
        calculation = "results./bmi_height", dbColumn = "results./bmi_height"))))
    time("qc.count")(qc.count())
    val ivc = InitialVisitControl(qc, InitialVisitDef("demo_case",
      Seq("patientid", "icd_code"), "intro./visit", "pt./visit_date",
      "intro./module", "ncd"))
    time("ivc.count")(ivc.count())
    val caseCodes = catalog.filter(c => c.typ == "case" && c.multipleLink.isEmpty)
    val coded = ToCodes(form, caseCodes, new MapResolver(col("data")),
      graft.functions.EpiWeek.StartDay(0), Map("gender" -> "pt1./gender"))
    time("tocodes.count")(coded.count())
    time("tocodes.again")(coded.count())
    time("tocodes.vars")(coded.select(explode(map_keys(col("variables")))).count())
    spark.stop()
  }
}
