package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config._
import graft.functions.{EpiWeek, MapResolver, VariableCompiler}
import graft.functions.EpiWeek.YearStartPolicy

/** The full batch pipeline (reference pipeline_worker/pipeline.py:27-61 wired
  * per demo_config.py:13-19):
  *
  *   quality_control → initial_visit_control → [write raw] → to_data_type →
  *   add_links → to_codes → [write data] → add_multiple_alerts → [write]
  *
  * assembled as one DataFrame program per data type. The reference's three
  * write barriers exist because later steps read earlier tables back; in the
  * batch recompute the set-based operators (AddLinks, MultipleAlerts) consume
  * the in-plan DataFrames directly, so barriers become optional
  * checkpoints, not correctness requirements.
  */
object DataPipeline {

  final case class EngineConfig(
      dataTypes: Seq[DataTypeDef],
      codes: Seq[CodeDef],                       // full catalog, all types
      links: Seq[LinkDef] = Nil,
      qc: Map[String, QualityControlDef] = Map.empty,       // per form
      initialVisit: Seq[InitialVisitDef] = Nil,
      locations: Seq[LocationNode] = Nil,
      alertData: Map[String, String] = Map.empty,
      policy: YearStartPolicy = EpiWeek.StartDay(0),
      alertIdLength: Int = 6)

  final case class Result(data: DataFrame, disregarded: DataFrame)

  /** Run the pipeline over raw form DataFrames `(uuid, data)`. */
  def process(spark: SparkSession, forms: Map[String, DataFrame],
              cfg: EngineConfig): Result = {
    // P1 + P2 per form
    val cleaned: Map[String, DataFrame] = forms.map { case (name, df) =>
      val dateValidations = cfg.dataTypes.filter(_.form == name).map { t =>
        ((t.dbColumn, t.condition) match {
          case (Some(c), Some(v)) => Some((c, v))
          case _                  => None
        }, t.dateColumn)
      }
      val qced = cfg.qc.get(name)
        .map(q => QualityControl(df, q, dateValidations))
        .getOrElse(df)
      val ivced = cfg.initialVisit.find(_.form == name)
        .map(iv => InitialVisitControl(qced, iv))
        .getOrElse(qced)
      name -> ivced
    }

    // per data type: fan-out → links → codes → data row
    val perType: Seq[DataFrame] = cfg.dataTypes.flatMap { t =>
      cleaned.get(t.form).map { form =>
        val (_, typed) = ToDataType.fanOut(form, t.form, Seq(t)).head
        val withLinks = AddLinks(typed,
          cleaned, cfg.links.filter(_.typ == t.name), cfg.alertIdLength)
        buildDataRows(spark, withLinks, t, cfg)
      }
    }
    val all = perType.reduce(_.unionByName(_))

    val data = all.filter(!col("disregard")).drop("disregard")
    val disregarded = all.filter(col("disregard")).drop("disregard")
    Result(data, disregarded)
  }

  /** to_codes step wrapper (process_steps/to_codes.py:32-152): location
    * resolution, multiple-row splitting, code evaluation, epi-week columns,
    * per-type counters. */
  private def buildDataRows(spark: SparkSession, typed: DataFrame,
                            t: DataTypeDef, cfg: EngineConfig): DataFrame = {
    val r = new MapResolver(col("data"))

    // multiple_row splitting (process_steps/to_codes.py:110-136): a register
    // form packs repeat groups col$1..col$N; split into sub-records with
    // uuid suffix :i
    val split = t.multipleRow match {
      case None => typed
      case Some(countCol) =>
        val n = coalesce(r.get(countCol).cast("int"), lit(0))
        // one candidate sub-record per repeat index; keep only indices where
        // at least one `col$i` value is non-empty (the reference's non-empty
        // guard), then rename `col$i` → `col`
        val subs = filter(
          transform(sequence(lit(1), greatest(n, lit(1))), i => struct(
            i.as("i"),
            size(map_filter(col("data"), (k, v) =>
              k.endsWith(concat(lit("$"), i.cast("string"))) && v =!= ""))
              .as("nonempty"),
            transform_keys(
              map_filter(col("data"), (k, _) =>
                !k.contains("$") || k.endsWith(concat(lit("$"), i.cast("string")))),
              (k, _) => regexp_replace(k, "\\$[0-9]+$", "")).as("m"))),
          s => s.getField("nonempty") > 0)
        typed
          .select(col("*"), explode(subs).as("__sub"))
          .withColumn("uuid",
            concat(col("uuid"), lit(":"), col("__sub.i").cast("string")))
          .withColumn("data", col("__sub.m"))
          .drop("__sub")
    }

    // location resolution via deviceid broadcast join; unknown device → drop
    // (codes/to_codes.py:115-117)
    val withLoc =
      if (cfg.locations.nonEmpty) {
        val dim = broadcast(Locations.deviceDimension(spark, cfg.locations)
          .withColumnRenamed("deviceid", "__dev"))
        split.join(dim, new MapResolver(col("data")).get("deviceid") === col("__dev"),
          "inner").drop("__dev")
      } else split

    // code evaluation for this data type
    val typeCodes = cfg.codes.filter(c => c.typ == t.name)
    val coded = ToCodes(withLoc, typeCodes, new MapResolver(col("data")),
      cfg.policy, cfg.alertData)

    // per-type counters (process_steps/to_codes.py:106-108)
    val withCounters = coded.withColumn("variables",
      map_concat(col("variables"),
        map(lit(t.varName), lit("1"), lit("data_entry"), lit("1"))))

    // event date + epi columns (process_steps/to_codes.py:138-152)
    val eventDate = VariableCompiler.parseDate(r.get(t.dateColumn))
    val yw = EpiWeek.epiYearWeek(eventDate, cfg.policy)
    withCounters
      .withColumn("date", date_trunc("DAY", eventDate))
      .withColumn("epi_year", yw.getField("epi_year"))
      .withColumn("epi_week", yw.getField("epi_week"))
      .withColumn("submission_date",
        VariableCompiler.parseDate(r.get("SubmissionDate")))
      .withColumn("device_id", r.get("deviceid"))
  }
}
