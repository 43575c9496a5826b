package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Reference hospital-limit gate (add_multiple_alerts.py:183-205,
    * 238-247): a 4-entry `threshold:d,w,hd,hw` config applies the separate
    * hospital limit to clinics whose clinic_type == "Hospital" — ON TOP of
    * the base filter (the reference pre-filters groups at the base limit
    * before the hospital check, so a hospital group needs BOTH). */
  private def limitGate(limit: Int, hospitalLimit: Option[Int]): Column =
    hospitalLimit match {
      case None => col("n") >= limit
      case Some(h) => col("n") >= limit &&
        (col("clinic_type").isNull || col("clinic_type") =!= "Hospital" ||
          col("n") >= h)
    }

  private def groupCols(hospitalLimit: Option[Int]) =
    if (hospitalLimit.isEmpty) Nil else Seq(col("clinic_type"))

  /** A1 — daily threshold (add_multiple_alerts.py:154-216): per clinic and
    * 1-day tumbling window, alert when the count of records carrying `varId`
    * reaches `limit`; contributing uuids collected (sorted = deterministic;
    * the reference emits them in frame order). duration=1 feeds
    * `alert_duration` at promotion (add_multiple_alerts.py:105).
    * @param hospitalLimit 4-entry configs' separate Hospital limit; requires
    *        a `clinic_type` column on `data` */
  def dailyThreshold(data: DataFrame, varId: String, limit: Int,
                     hospitalLimit: Option[Int] = None): DataFrame =
    data.filter(hasVar(varId))
      .groupBy(col("clinic") +: to_date(col("date")).as("day") +:
        groupCols(hospitalLimit): _*)
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("uuid"))).as("uuids"))
      .filter(limitGate(limit, hospitalLimit))
      .drop("clinic_type")
      .withColumn("var_id", lit(varId))
      .withColumn("duration", lit(1))

  /** A2 — weekly threshold (add_multiple_alerts.py:218-252): epi-week-aligned
    * weekly windows; epi_year/epi_week are precomputed data columns. */
  def weeklyThreshold(data: DataFrame, varId: String, limit: Int,
                      hospitalLimit: Option[Int] = None): DataFrame =
    data.filter(hasVar(varId))
      .groupBy(col("clinic") +: col("epi_year") +: col("epi_week") +:
        groupCols(hospitalLimit): _*)
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("uuid"))).as("uuids"))
      .filter(limitGate(limit, hospitalLimit))
      .drop("clinic_type")
      .withColumn("var_id", lit(varId))
      .withColumn("duration", lit(7))

  /** A3 — double-doubling (add_multiple_alerts.py:255-358), the reference
    * spec exactly:
    *
    *  - weekly counts per clinic on a monotonic 52-week axis
    *    (epi_year*52 + epi_week - 1 — the same arithmetic as the reference's
    *    ±52 year-wrap fixups, which also treat every year as 52 weeks);
    *  - a doubling run is three CONSECUTIVE weeks (w, w+1, w+2) with
    *    count(w) > 1, count(w+1) >= 2*count(w), count(w+2) >= 2*count(w+1).
    *    A week with no records counts 0 and breaks the chain
    *    (`counts.get(week±k, 0)`) — weeks 1,5,9 with counts 2,4,8 do NOT
    *    alert;
    *  - the run alerts only when the 5-week window centered on at least one
    *    of the run's weeks holds >= `minTotal` cases in total (the reference
    *    evaluates the check once per triggering record, whose week centers
    *    the ±2-week fetch; records exist in all three run weeks, so the batch
    *    equivalent is the disjunction over the three centerings);
    *  - the alert's uuids are those of the run's LAST week
    *    (`uuids[week + 2]`).
    *
    * The zero-count weeks are materialized per clinic via
    * `sequence(min_wk, max_wk)` — the dense frame is clinic × week-range
    * sized (dimension-scale), never fact-scale, so the explode is safe at
    * any corpus size. */
  def doubleDoubling(data: DataFrame, varId: String,
                     minTotal: Int = 14): DataFrame = {
    val weekly = data.filter(hasVar(varId))
      .withColumn("__wk", col("epi_year").cast("long") * 52 +
        col("epi_week").cast("long") - 1)
      .groupBy(col("clinic"), col("__wk"))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("uuid"))).as("uuids"))
    val bounds = weekly.groupBy(col("clinic"))
      .agg(min(col("__wk")).as("__lo"), max(col("__wk")).as("__hi"))
    val dense = bounds
      .select(col("clinic"), explode(sequence(col("__lo"), col("__hi"))).as("__wk"))
      .join(weekly, Seq("clinic", "__wk"), "left")
      .withColumn("n0", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy(col("clinic")).orderBy(col("__wk"))
    def lg(i: Int) = lag(col("n0"), i, 0L).over(w)
    def ld(i: Int) = lead(col("n0"), i, 0L).over(w)
    val run = col("l2") > 1 &&
      col("l1") >= col("l2") * 2 && col("n0") >= col("l1") * 2
    val winEndMinus2 = col("l4") + col("l3") + col("l2") + col("l1") + col("n0")
    val winEndMinus1 = col("l3") + col("l2") + col("l1") + col("n0") + col("f1")
    val winEnd       = col("l2") + col("l1") + col("n0") + col("f1") + col("f2")
    dense
      .withColumn("l1", lg(1)).withColumn("l2", lg(2))
      .withColumn("l3", lg(3)).withColumn("l4", lg(4))
      .withColumn("f1", ld(1)).withColumn("f2", ld(2))
      .filter(run && (winEndMinus2 >= minTotal || winEndMinus1 >= minTotal ||
        winEnd >= minTotal))
      // alerting rows always carry records (n0 >= 2*l1 >= 4*l2 > 4), so the
      // left-join columns n/uuids are non-null here
      .select(col("clinic"),
        (col("__wk") / 52).cast("int").as("epi_year"),
        (col("__wk") % 52 + 1).cast("int").as("epi_week"),
        col("n"), col("uuids"))
      .withColumn("var_id", lit(varId))
      .withColumn("duration", lit(7))
  }

  /** A4 — representative promotion (add_multiple_alerts.py:78-143): within
    * each alert group the smallest uuid becomes the representative and gains
    * the full alert_* key set —
    *   alert=1, alert_type=<typeName>, alert_duration=<alert's duration>,
    *   alert_reason=<var_id>, alert_id=last-N chars of its uuid
    * — while the others become sub-alerts (sub_alert=1,
    * master_alert=<representative uuid>) and LOSE any alert / alert_id keys
    * they carried (add_multiple_alerts.py:131-137). EVERY member (rep and
    * sub) is enriched with `alert_<k>` values pulled from ITS OWN raw form
    * record via the data ⋈ form_table uuid join
    * (add_multiple_alerts.py:89-101, 140-143).
    *
    * A uuid claimed by several alerts is promoted once (the reference's
    * `found_uuids` first-wins set); the batch recompute picks the winner
    * deterministically by (var_id, duration, representative).
    *
    * @param alerts  output of one of the detectors (columns: uuids, var_id,
    *                duration)
    * @param form    raw form DataFrame `(uuid, data map)` for enrichment
    * @param alertData name → form data column for `alert_<name>` values
    */
  def promote(data: DataFrame, alerts: DataFrame, form: DataFrame,
              alertData: Map[String, String] = Map.empty,
              typeName: String = "threshold",
              alertIdLength: Int = 6): DataFrame = {
    val claim = Window.partitionBy(col("__a_uuid"))
      .orderBy(col("__var_id"), col("__dur"), col("__rep"))
    val exploded = alerts
      .select(col("var_id").as("__var_id"),
        col("duration").cast("string").as("__dur"),
        array_min(col("uuids")).as("__rep"),
        explode(col("uuids")).as("__a_uuid"))
      .withColumn("__claim_rn", row_number().over(claim))
      .filter(col("__claim_rn") === 1) // first-wins dedup (found_uuids)
      .drop("__claim_rn")
    // enrichment join against the raw form runs on the ALERT-sized frame,
    // not the fact stream: exploded (small) ⋈ form picks out only the alert
    // uuids' form records, and the result broadcasts into the final join
    val formData = form.select(col("uuid").as("__f_uuid"),
      col("data").as("__f_data"))
    val enriched = exploded
      .join(formData, col("__a_uuid") === col("__f_uuid"), "left")
      .drop("__f_uuid")
    val alertEntries: Seq[Column] = alertData.toSeq.flatMap { case (name, c) =>
      Seq(lit(s"alert_$name"), element_at(col("__f_data"), c))
    }
    def plus(base: Column, extra: Seq[Column]) =
      map_concat(base, map(extra ++ alertEntries: _*))
    data.join(enriched, col("uuid") === col("__a_uuid"), "left")
      .withColumn("variables",
        when(col("__a_uuid").isNull, col("variables"))
          .when(col("uuid") === col("__rep"),
            plus(col("variables"), Seq(
              lit("alert"), lit("1"),
              lit("alert_type"), lit(typeName),
              lit("alert_duration"), col("__dur"),
              lit("alert_reason"), col("__var_id"),
              lit("alert_id"),
              substring(col("uuid"), -alertIdLength, alertIdLength))))
          .otherwise(
            plus(
              // sub-alerts lose any alert/alert_id they carried
              map_filter(col("variables"), (k, _) =>
                k =!= "alert" && k =!= "alert_id"),
              Seq(lit("sub_alert"), lit("1"),
                lit("master_alert"), col("__rep")))))
      .drop("__var_id", "__dur", "__rep", "__a_uuid", "__f_data")
  }
}
