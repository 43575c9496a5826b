package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the prefix-filtered jaccard path: candidate volume
  * (with and without the PPJoin length/positional filters) vs final
  * pairs at a scale factor, plus the wall time of the real operator.
  * Mirrors [[graft.operators.Dedup.jaccardPairsPrefix]]'s candidate
  * stage — keep the two in sync when the filters change. */
object JpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val b = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
    graft.Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    val postings = graft.operators.Dedup.shinglePostings(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("g"))
      .localCheckpoint(true)
    println(s"JP postings=${postings.count()}")
    val dfs = postings.groupBy(col("g")).agg(count(lit(1)).as("df"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val prefix = postings.join(dfs, Seq("g"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rn") <=
        col("__n") - ceil(lit(t) * col("__n") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("g"), col("__n"), col("__rn"))
      .localCheckpoint(true)
    println(s"JP prefix=${prefix.count()}")
    def candCount(filtered: Boolean): Long = {
      val base = col("p1.g") === col("p2.g") &&
        col("p1.doc_id") < col("p2.doc_id")
      val cond = if (!filtered) base
      else base &&
        col("p1.__n").cast("double") >= lit(t) * col("p2.__n") - lit(1e-9) &&
        col("p2.__n").cast("double") >= lit(t) * col("p1.__n") - lit(1e-9) &&
        lit(1.0) + least(col("p1.__n") - col("p1.__rn"),
          col("p2.__n") - col("p2.__rn")).cast("double") >=
          lit(t / (1.0 + t)) * (col("p1.__n") + col("p2.__n")) - lit(1e-9)
      val j = prefix.as("p1").join(prefix.as("p2"), cond)
        .select(col("p1.doc_id"), col("p2.doc_id")).distinct()
      println("JP join_plan filtered=" + filtered + " :: " +
        j.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange"))
          .map(_.trim.take(90)).mkString(" | "))
      j.count()
    }
    println(s"JP cand_unfiltered=${candCount(filtered = false)}")
    println(s"JP cand_filtered=${candCount(filtered = true)}")
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.jaccardPairsPrefix(docs, t).count()
    println(f"JP final=$n operator_s=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
