package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** add_multiple_alerts step (reference
  * pipeline_worker/process_steps/add_multiple_alerts.py:37-358) re-expressed
  * as set-based window aggregations over the coded `data` DataFrame
  * (columns: uuid, clinic, date, epi_year, epi_week, variables).
  *
  * The reference runs per-record back-queries against the whole history
  * (ORM → pandas per incoming record); here each detection is ONE
  * aggregation over history ∪ batch — same result, no driver loops.
  */
object MultipleAlerts {

  private def hasVar(varId: String) =
    map_contains_key(col("variables"), varId)

  /** A1 — daily threshold (add_multiple_alerts.py:154-216): per clinic and
    * 1-day tumbling window, alert when the count of records carrying `varId`
    * reaches `limit`; contributing uuids collected (sorted = deterministic). */
  def dailyThreshold(data: DataFrame, varId: String, limit: Int): DataFrame =
    data.filter(hasVar(varId))
      .groupBy(col("clinic"), to_date(col("date")).as("day"))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("uuid"))).as("uuids"))
      .filter(col("n") >= limit)
      .withColumn("var_id", lit(varId))

  /** A2 — weekly threshold (add_multiple_alerts.py:218-252): epi-week-aligned
    * weekly windows; epi_year/epi_week are precomputed data columns. */
  def weeklyThreshold(data: DataFrame, varId: String, limit: Int): DataFrame =
    data.filter(hasVar(varId))
      .groupBy(col("clinic"), col("epi_year"), col("epi_week"))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("uuid"))).as("uuids"))
      .filter(col("n") >= limit)
      .withColumn("var_id", lit(varId))

  /** A3 — double-doubling (add_multiple_alerts.py:255-358): weekly counts per
    * clinic; alert when counts double across two consecutive week pairs.
    * `lag` over (epi_year, epi_week) ordering replaces the reference's manual
    * ±52 year-wrap fixups; weeks with zero records break the doubling chain
    * there and here (no row → lag sees the gap as the neighboring week).
    * The reference also skips windows with under 14 total cases. */
  def doubleDoubling(data: DataFrame, varId: String,
                     minTotal: Int = 14): DataFrame = {
    val weekly = data.filter(hasVar(varId))
      .groupBy(col("clinic"), col("epi_year"), col("epi_week"))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("uuid"))).as("uuids"))
    val w = Window.partitionBy(col("clinic"))
      .orderBy(col("epi_year"), col("epi_week"))
    weekly
      .withColumn("l1", lag(col("n"), 1).over(w))
      .withColumn("l2", lag(col("n"), 2).over(w))
      .withColumn("total", col("n") + coalesce(col("l1"), lit(0L)) +
        coalesce(col("l2"), lit(0L)))
      .filter(col("total") >= minTotal &&
        col("n") >= col("l1") * 2 && col("l1") >= col("l2") * 2 && col("l2") > 1)
      .select(col("clinic"), col("epi_year"), col("epi_week"), col("n"),
        col("uuids"))
      .withColumn("var_id", lit(varId))
  }

  /** A4 — representative promotion (add_multiple_alerts.py:78-143): within
    * each alert group the smallest uuid becomes the representative and gains
    * the alert_* keys (incl. alert_id = last-N chars of its uuid); the others
    * become sub-alerts pointing at it.
    *
    * @param alerts output of one of the detectors (uuids + var_id columns)
    */
  def promote(data: DataFrame, alerts: DataFrame,
              alertIdLength: Int = 6): DataFrame = {
    val exploded = alerts
      .select(col("var_id").as("__var_id"),
        array_min(col("uuids")).as("__rep"),
        explode(col("uuids")).as("__a_uuid"))
      .dropDuplicates("__a_uuid") // within-batch dedup (reference found_uuids)
    data.join(exploded, col("uuid") === col("__a_uuid"), "left")
      .withColumn("variables",
        when(col("__a_uuid").isNull, col("variables"))
          .when(col("uuid") === col("__rep"),
            map_concat(col("variables"), map(
              lit("alert"), lit("1"),
              lit("alert_reason"), col("__var_id"),
              lit("alert_id"), substring(col("uuid"), -alertIdLength, alertIdLength))))
          .otherwise(
            map_concat(col("variables"), map(
              lit("sub_alert"), lit("1"),
              lit("master_alert"), col("__rep")))))
      .drop("__var_id", "__rep", "__a_uuid")
  }
}
