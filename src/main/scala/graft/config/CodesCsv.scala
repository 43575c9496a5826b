package graft.config

import org.apache.spark.sql.SparkSession

/** Loader for the AggregationVariables rule-catalog CSV format
  * (the reference's country_config/variable_codes CSVs; column list at
  * model.py:175-228, demo header demo_codes.csv:1). Config-sized: parsed
  * with Spark's CSV reader (multiline quoted fields) and collected to the
  * driver — the catalog is plan-time input, never distributed data.
  */
object CodesCsv {

  /** field_to_list (util/__init__.py:85-104): comma-split, strip, drop
    * empties. */
  private def toList(s: String): Seq[String] =
    Option(s).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

  private def truthy(s: String): Boolean =
    Option(s).exists(v => v.trim == "1" || v.trim.equalsIgnoreCase("true"))

  def load(spark: SparkSession, paths: String*): Seq[CodeDef] = {
    val df = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(paths: _*)
    df.collect().toSeq.flatMap { row =>
      def get(name: String): String =
        if (df.columns.contains(name)) Option(row.getAs[String](name)).getOrElse("")
        else ""
      val id = get("id").trim
      if (id.isEmpty) None
      else Some(CodeDef(
        id = id,
        typ = get("type").trim,
        form = get("form").trim,
        multipleLink = Option(get("multiple_link").trim).filter(_.nonEmpty),
        dbColumn = get("db_column"),
        method = get("method").trim,
        condition = get("condition"),
        calculation = get("calculation"),
        category = toList(get("category")),
        alert = truthy(get("alert")),
        alertType = get("alert_type").trim,
        disregard = truthy(get("disregard")),
        calculationGroup = Option(get("calculation_group").trim).filter(_.nonEmpty),
        calculationPriority = Option(get("calculation_priority").trim)
          .filter(_.nonEmpty).flatMap(p => scala.util.Try(p.toDouble.toInt).toOption)))
    }
  }
}
