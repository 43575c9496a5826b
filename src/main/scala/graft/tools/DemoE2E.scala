package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.config._
import graft.operators.{DataPipeline, MultipleAlerts}
import graft.sources.FakeData

/** End-to-end throughput demo: the full demo pipeline (real 198-code
  * catalog from the reference config, QC → visit control → fan-out → codes →
  * alerts) over N generated demo_case rows. The reference processes 15k-row
  * chunks record-at-a-time; this runs the whole corpus as one plan.
  *
  * Besides the console summary, writes a STEP-TIMING ARTIFACT (one JSON
  * file, path from GRAFT_STEP_TIMINGS or /tmp/graft_demo_e2e_steps.json):
  * per-step durations (generate, construct, analyze, optimize, physical,
  * materialize, alerts) plus the [[graft.monitoring.StepMonitor]]
  * query-execution records — the reference persists the same shape to its
  * step_monitoring table (process_steps/__init__.py:49-57), and a per-step
  * file makes a regression in ONE step visible round-over-round where the
  * end-to-end number would average it away.
  *
  * Reading `construct`: since the in-plan [[graft.plans.CodegenFence]]
  * replaced the old `toRdd` stage barriers, `construct` is genuinely
  * driver-side work again (Column-tree building + per-fence analysis,
  * ~2.3 s for the 198-code catalog at any data size) and `materialize`
  * carries ALL data work under one adaptive plan. Under the old barriers,
  * AQE plan finalization EXECUTED the exchange stages below each barrier
  * inside `construct` (measured 8 s at 100k rows, 18 s at 1M), hiding
  * data work in what looked like planning. The artifact exists to make
  * exactly this kind of attribution visible.
  *
  * Usage: runMain graft.tools.DemoE2E [nRows]
  */
object DemoE2E {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.debug.maxToStringFields", "5000")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    if (sys.env.contains("GRAFT_NO_CONSTRAINTS"))
      b.config("spark.sql.constraintPropagation.enabled", "false")
    if (sys.env.contains("GRAFT_NO_WSC"))
      b.config("spark.sql.codegen.wholeStage", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val monitor = graft.monitoring.StepMonitor.install(spark)
    val steps = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

    val codesDir = "/root/reference/meerkat_abacus/country_config/variable_codes"
    val catalog = CodesCsv.load(spark,
      s"$codesDir/demo_codes.csv", s"$codesDir/demographic_codes.csv")

    val locations = Seq(LocationNode(1, "Demo", "country", 0),
      LocationNode(2, "Region A", "region", 1),
      LocationNode(3, "District X", "district", 2)) ++
      (0 until 50).map(i => LocationNode(10 + i, s"Clinic $i", "clinic", 3,
        deviceIds = Seq(s"d$i"), clinicType = Some("Hospital")))

    val fields = Map[String, FakeData.FieldKind](
      "intro./visit" -> FakeData.OneOf(Seq("new", "return", "referral")),
      "intro./module" -> FakeData.OneOf(Seq("ncd", "cd", "mh")),
      "pt./visit_date" -> FakeData.DateWithin("2016-06-01", 180),
      "SubmissionDate" -> FakeData.DateWithin("2016-06-02", 180),
      "deviceid" -> FakeData.OneOf((0 until 50).map(i => s"d$i")),
      "pt1./gender" -> FakeData.OneOf(Seq("male", "female")),
      "pt1./age" -> FakeData.IntRange(0, 99),
      "pt1./status" -> FakeData.OneOf(Seq("refugee", "national")),
      "nationality" -> FakeData.OneOf(Seq("demo", "null_island")),
      "icd_code" -> FakeData.OneOf(Seq("A80.9", "A00", "E10", "J10", "B05.9")),
      "pregnant" -> FakeData.OneOf(Seq("yes", "no")),
      "smoke_ever" -> FakeData.OneOf(Seq("yes", "no")),
      "results./bmi_weight" -> FakeData.IntRange(40, 120),
      "results./bmi_height" -> FakeData.IntRange(120, 210),
      "patientid" -> FakeData.PatientId(2000),
      "pt./pid" -> FakeData.PatientId(2000))

    // land the generated form in parquet first (S8 raw-form persistence) —
    // feeding the pipeline from a raw generator expression would let
    // CollapseProject inline the map construction into every downstream
    // column reference
    val formPath = s"/tmp/graft_demo_e2e_form_$n"
    val tGen = System.nanoTime()
    FakeData.form(spark, "demo_case", fields, n, seed = 1L)
      .write.mode("overwrite").parquet(formPath)
    steps += ("generate" -> (System.nanoTime() - tGen) / 1e9)
    val form = spark.read.parquet(formPath)

    val cfg = DataPipeline.EngineConfig(
      dataTypes = Seq(DataTypeDef("case", "demo_case", Some("intro./visit"),
        Some("new"), "pt./visit_date", "tot_1")),
      codes = catalog,
      qc = Map("demo_case" -> QualityControlDef(qcCodes = Seq(
        CodeDef(id = "qc_height", method = "between", condition = "50,220",
          calculation = "results./bmi_height", dbColumn = "results./bmi_height")))),
      initialVisit = Seq(InitialVisitDef("demo_case",
        Seq("patientid", "icd_code"), "intro./visit", "pt./visit_date",
        "intro./module", "ncd")),
      locations = locations,
      alertData = Map("gender" -> "pt1./gender"),
      // production shape: the data rows drop the raw form map (the
      // reference's data table carries none either), which lets the
      // 198-code ToCodes barrier prune its input columns
      retainRawData = false)

    val t0 = System.nanoTime()
    val result = DataPipeline.process(spark, Map("demo_case" -> form), cfg)
    steps += ("construct" -> (System.nanoTime() - t0) / 1e9)
    def phase(name: String)(f: => Any): Unit = {
      val t = System.nanoTime(); f
      val secs = (System.nanoTime() - t) / 1e9
      steps += (name -> secs)
      println(f"PHASE $name $secs%.2f s")
    }
    phase("analyze")(result.data.queryExecution.analyzed)
    phase("optimize")(result.data.queryExecution.optimizedPlan)
    phase("physical")(result.data.queryExecution.executedPlan)
    // materialization barrier, as production would write `data` out here
    result.data.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tMat = System.nanoTime()
    val rows = result.data.count()
    steps += ("materialize" -> (System.nanoTime() - tMat) / 1e9)
    val elapsed = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val alerts = MultipleAlerts.dailyThreshold(result.data, "cmd_1", 3).count()
    val alertSecs = (System.nanoTime() - t1) / 1e9
    steps += ("alerts" -> alertSecs)

    val withAlert = result.data
      .filter(element_at(col("variables"), "alert") === "1").count()
    println(f"DEMO_E2E rows_in=$n rows_out=$rows individual_alerts=$withAlert " +
      f"threshold_alerts=$alerts pipeline_s=$elapsed%.2f alerts_s=$alertSecs%.2f " +
      f"rows_per_s=${rows / elapsed}%.0f")
    // QueryExecutionListener delivery is async: poll until the record
    // count is stable so the artifact doesn't drop the last actions
    var snap = monitor.snapshot
    val deadline = System.currentTimeMillis() + 3000
    var settled = false
    while (!settled && System.currentTimeMillis() < deadline) {
      Thread.sleep(150)
      val again = monitor.snapshot
      settled = again.size == snap.size
      snap = again
    }
    writeStepArtifact(n, rows, elapsed, steps.toSeq, snap)
    spark.stop()
  }

  /** One JSON file: the named step durations plus every query execution
    * the listener saw — small, diffable round-over-round. */
  private def writeStepArtifact(n: Int, rows: Long, totalSecs: Double,
                                steps: Seq[(String, Double)],
                                execs: Seq[graft.monitoring.StepMonitor.StepRecord]): Unit = {
    def ms(s: Double) = math.rint(s * 1000) / 1000
    // truncate BEFORE escaping (truncating after can cut an escape pair in
    // half), and escape every control char — Spark stage-failure messages
    // carry newlines that would break the JSON line otherwise
    def jstr(s: String): String = "\"" + s.take(120).flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val path = sys.env.getOrElse("GRAFT_STEP_TIMINGS",
      "/tmp/graft_demo_e2e_steps.json")
    val stepJson = steps.map { case (k, v) => s"""{"step":"$k","secs":${ms(v)}}""" }
      .mkString("[", ",", "]")
    val execJson = execs.map { r =>
      val err = r.error.map(jstr).getOrElse("null")
      s"""{"action":${jstr(r.step)},"start_ms":${r.startMs},"duration_ms":${r.durationMs},"error":$err}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"rows_in":$n,"rows_out":$rows,"total_s":${ms(totalSecs)},""" +
        s""""steps":$stepJson,"query_executions":$execJson}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    println(s"STEP_TIMINGS $path")
  }
}
