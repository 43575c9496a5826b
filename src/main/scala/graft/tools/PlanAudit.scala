package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Prints physical plans for key gate queries and summarizes exchanges /
  * broadcasts / pushed filters — the would-this-survive-100TB audit. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE wraps the executed plan in AdaptiveSparkPlan whose pre-execution
      // string hides the *(n) codegen markers; disable for a readable audit
      .config("spark.sql.adaptive.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val targets = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing_summary", "q3_top_orders", "p1_quality_control",
      "p4_add_links_to", "a3_double_doubling", "dsl_predicates",
      "dedup_jaccard", "ann_bruteforce")
    targets.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      val bcasts = "BroadcastExchange".r.findAllIn(plan).size
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).mkString(" | ")
      val codegen = "\\*\\([0-9]+\\)".r.findAllIn(plan).toSet.size
      println(s"AUDIT $name shuffles=$exchanges broadcasts=$bcasts codegenSpans=$codegen")
      if (pushed.nonEmpty) println(s"AUDIT   $name pushed: ${pushed.take(300)}")
    }
    spark.stop()
  }
}
