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
  * to plans.
  *
  * The bench evidence is built to be TRUSTWORTHY AS AN ARTIFACT, not
  * just a number: a prior round's driver run recorded a 6× skew on two
  * queries that two clean paired re-runs could not reproduce —
  * environmental load, invisible in the artifact itself. The evidence
  * (per-query warm + every timed run, before/after /proc/loadavg, a
  * `tainted` flag with the foreign-JVM pid list sampled per query) is
  * written to `bench_detail.json` in the working directory, and the
  * stdout line stays COMPACT: metric/total/per-query medians/taint only.
  * Round 8 carried the full runs evidence inline and the resulting
  * ~12 KB line outran the driver's ~4 KB tail capture — the artifact
  * recorded `parsed: null`, strictly worse than a short parseable line.
  * All times round to ms; the noise floor is far above 1 ms and full
  * 17-digit doubles tripled the line length.
  *
  * MEASUREMENT BASIS (since round 9): queries are forced via
  * `queryExecution.toRdd.count()` — full materialization of every output
  * column. The previous `.count()` basis let Catalyst prune projections
  * and eliminate unique-key left joins above the timed work, so
  * projection-heavy queries reported scan-only times; numbers before and
  * after this round are NOT comparable for such queries (expect an honest
  * upshift), and round-over-round comparisons restart from the r9 line.
  */
object Bench {

  /** ms precision: benchmark noise floor is far above 1 ms, and full
    * 17-digit doubles tripled the artifact line length. */
  private def ms(t: Double): Double = math.rint(t * 1000) / 1000

  /** (1, 5, 15)-minute load averages; zeros when /proc is unreadable. */
  private def loadavg(): Seq[Double] =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")))
      .split("\\s+").take(3).toSeq.map(_.toDouble)
    catch { case _: Throwable => Seq(0.0, 0.0, 0.0) }

  /** This pid plus its ancestry (the sbt/shell chain that launched us) —
    * the processes that are ALLOWED to be JVMs during a bench. */
  private def selfAndAncestors(): Set[Long] = {
    def ppid(pid: Long): Option[Long] =
      try {
        val stat = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/$pid/stat")))
        // fields after the parenthesised comm (which may contain spaces)
        Some(stat.substring(stat.lastIndexOf(')') + 2).split(" ")(1).toLong)
      } catch { case _: Throwable => None }
    var acc = Set(ProcessHandle.current().pid())
    var p = ppid(acc.head)
    while (p.exists(x => x > 1 && !acc(x))) { acc += p.get; p = ppid(p.get) }
    acc
  }

  /** Live `java` processes that are neither this JVM nor its launcher
    * chain. Any hit means timings share cores with another workload. */
  private def foreignJvms(): Seq[Long] = {
    val mine = selfAndAncestors()
    Option(new java.io.File("/proc").listFiles()).getOrElse(Array.empty)
      .toSeq
      .flatMap(f => scala.util.Try(f.getName.toLong).toOption)
      .filterNot(mine)
      .filter { pid =>
        scala.util.Try(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/$pid/comm"))).trim == "java")
          .getOrElse(false)
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val timedRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val loadBefore = loadavg()
    val jvmsBefore = foreignJvms()
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
    // taint is sampled per query, not just at the suite's ends — a
    // concurrent JVM that starts and exits mid-suite is exactly the r7
    // skew scenario the flag exists for
    val foreignSeen = scala.collection.mutable.SortedSet.empty[Long]
    foreignSeen ++= jvmsBefore
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // settle before each query (GC itself happens per rep inside once())
      Thread.sleep(100)
      foreignSeen ++= foreignJvms()
      def once(): Double = {
        // per-REP quiescence, not just per-query: collect the previous
        // rep's garbage before starting the clock. Heavy allocators
        // (posting-list pair explosions) otherwise hand each successive
        // rep a fuller old gen — observed as monotonically degrading reps
        // (2.6→6.9→17.4 s on dedup_containment) that billed rep N for
        // rep N−1's GC debt.
        System.gc()
        val t0 = System.nanoTime()
        // FULL materialization, not .count(): a count on top lets the
        // optimizer prune projections and eliminate unique-key left joins
        // (observed: the substring-scrub pipeline collapsed to a bare scan
        // — 0.22 s "benched" vs 1.7 s of real work), so count-benched
        // numbers flatter any query whose top is prunable. toRdd executes
        // the plan optimized for its FULL output — every column computed,
        // every join real — which is what the verify dump and any real
        // consumer pay, minus sink IO.
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case _: Throwable => () }
        val t = (System.nanoTime() - t0) / 1e9
        // some operators persist small intermediates (dedup postings/bands);
        // drop them so no run is measured under another's cache
        spark.catalog.clearCache()
        t
      }
      val warm = once()
      // large plans are often STILL JIT-compiling during their first timed
      // runs when they execute early in the JVM's life (observed: a 5 s
      // first contact followed by 2.9→2.3→1.8 s timed runs — the median
      // lands mid-warmup and swings >30% between paired benches). One
      // extra warm pass for anything whose first contact was slow keeps
      // the medians attributable to plans.
      val warm2 = if (warm > 2.0) once() else -1.0
      val times = Seq.fill(timedRuns)(once())
      val median = times.sorted.apply(times.length / 2)
      System.err.println(
        f"[bench] $name%-28s warm=$warm%7.2fs runs=${times.map(t => f"$t%.2f").mkString(",")} median=$median%7.2fs")
      (name, ms(median), (ms(warm), if (warm2 < 0) None else Some(ms(warm2))), times.map(ms))
    }
    val loadAfter = loadavg()
    foreignSeen ++= foreignJvms()
    val foreign = foreignSeen.toSeq
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, _, (w, w2), ts) =>
      val warm2 = w2.map(x => ",\"warm2\":" + x).getOrElse("")
      s"\"" + k + "\":{\"warm\":" + w + warm2 + ",\"t\":[" + ts.mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val total = ms(results.map(_._2).sum)
    val load = s"""{"before":[${loadBefore.mkString(",")}],"after":[${loadAfter.mkString(",")}]}"""
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""runs":$runs,"loadavg":$load,"tainted":${foreign.nonEmpty},""" +
      s""""foreign_jvms":[${foreign.mkString(",")}],"sf":"$sfDir"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""tainted":${foreign.nonEmpty},"detail":"$detailPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
