package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Stage-level decomposition of the `dsl_to_codes_alert` gate — the bench
  * ceiling on the full-materialization basis. Times each suffix of the
  * pipeline via `toRdd.count()` (the bench's forcing action) so the
  * increments attribute cost to scan / map build / explode / global sort. */
object ToCodesProbe {
  private def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    val full = graft.SparkEntry.queries("dsl_to_codes_alert")(spark, dir)
    // suffixes: full (incl. sort), no-sort, no-explode (coded rows), scan
    val noSort = full.queryExecution.logical match {
      case org.apache.spark.sql.catalyst.plans.logical.Sort(_, _, child, _) =>
        org.apache.spark.sql.GraftColumnBridge.ofRows(spark, child)
      case _ => full
    }
    for (_ <- 1 to 2) {
      time("scan")(force(Tables.lineitem(spark, dir)))
      time("coded_no_explode") {
        import graft.config.CodeDef
        force(noSort.queryExecution.logical.collectFirst {
          case p: org.apache.spark.sql.catalyst.plans.logical.Project
            if p.projectList.exists(_.name == "variables") =>
            org.apache.spark.sql.GraftColumnBridge.ofRows(spark, p)
        }.getOrElse(noSort))
      }
      time("explode_no_sort")(force(noSort))
      time("full_with_sort")(force(full))
    }
    spark.stop()
  }
}
