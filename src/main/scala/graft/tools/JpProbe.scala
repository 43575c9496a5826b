package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the prefix-filtered jaccard path: candidate
  * volume vs final pairs at a scale factor. */
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
      .select(col("doc_id"), col("g"), col("__n"))
      .localCheckpoint(true)
    println(s"JP prefix=${prefix.count()}")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"JP $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val cand = timed("cand_ckpt") {
      prefix.as("p1").join(prefix.as("p2"),
          col("p1.g") === col("p2.g") && col("p1.doc_id") < col("p2.doc_id"))
        .groupBy(col("p1.doc_id").as("doc_a"), col("p2.doc_id").as("doc_b"))
        .agg(first(col("p1.__n")).as("n_a"), first(col("p2.__n")).as("n_b"))
        .localCheckpoint(true)
    }
    println(s"JP cand=${cand.count()}")
    val common = timed("verify_ckpt") {
      cand
        .join(postings.select(col("doc_id").as("doc_a"), col("g")), Seq("doc_a"))
        .join(postings.select(col("doc_id").as("doc_b"), col("g")),
          Seq("doc_b", "g"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_common"),
          first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
        .localCheckpoint(true)
    }
    println(s"JP common=${common.count()}")
    println(s"JP final=${graft.operators.Dedup.jaccardPairs(docs, t, maxShingleDf = Some(1000)).count()}")
    spark.stop()
  }
}
