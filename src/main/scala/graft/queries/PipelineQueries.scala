package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Gate queries for the reference's pipeline-step operators (SURVEY.md §2.2)
  * and aggregation operators (§2.3), re-expressed over the testdata tables.
  *
  * Mapping (reference step → demo here):
  *  - P1 quality_control  (quality_control.py:14-148)  → p1_quality_control
  *  - P2 initial_visit_control (initial_visit_control.py:25-136) → p2_initial_visit_control
  *  - P3 to_data_type     (to_data_type.py:16-49)      → p3_to_data_type
  *  - P4 add_links        (add_links.py:28-157)        → p4_add_links_to / p4_add_links_alert_match
  *  - A1 daily threshold  (add_multiple_alerts.py:154-216) → a1_daily_threshold
  *  - A2 weekly threshold (add_multiple_alerts.py:218-252) → a2_weekly_threshold
  *  - A3 double-doubling  (add_multiple_alerts.py:255-358) → a3_double_doubling
  *  - A4 representative   (add_multiple_alerts.py:78-143)  → a4_alert_representative
  *  - A5 population rollup (database_setup.py:157-166)     → a5_population_rollup
  *  - A6 multiple_link agg (codes/to_codes.py:217-242)     → a6_multiple_link
  */
object PipelineQueries extends QueryPack {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P1: sampling gate is skipped (nondeterministic); date gate + exclusion
    // anti-join + repair-or-null + discard codes, as in quality_control.py.
    "p1_quality_control" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // exclusion list arrives as its own little table in the reference
      // (config `exclusion_lists`); modeled here as a derived uuid list,
      // applied with a genuine left_anti join (not a filter) so the plan
      // shape matches what runs at scale (broadcast anti-join).
      val exclusions = ev.filter(col("event_id") % 101 === 0)
        .select(col("event_id").as("ex_id"))
      ev.filter(col("ts") >= lit("2024-01-03").cast("timestamp"))
        .filter(col("event_type") =!= "signup") // discard-category QC code
        .join(broadcast(exclusions), col("event_id") === col("ex_id"), "left_anti")
        .select(col("event_id"), col("user_id"), col("event_type"),
          // repair code: out-of-range value → NULL (quality_control.py:116-139)
          when(col("value") >= 0 && col("value") < 500, col("value"))
            .otherwise(lit(null)).as("value_r"))
        .orderBy(col("event_id"))
    }),

    // P2: within each (user_id, event_type) history ordered by time, the
    // earliest row keeps visit="new", later rows are demoted to "return".
    "p2_initial_visit_control" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("visit",
          when(row_number().over(w) === 1, lit("new")).otherwise(lit("return")))
        .select(col("event_id"), col("user_id"), col("event_type"), col("visit"))
        .orderBy(col("event_id"))
    }),

    // P3: conditional multicast — one record feeds 0..N typed streams.
    "p3_to_data_type" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val highValue = o.filter(col("o_totalprice") >= 250000)
        .select(lit("high_value").as("type"), col("o_orderkey"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(lit("urgent").as("type"), col("o_orderkey"))
      val all = o.select(lit("all_orders").as("type"), col("o_orderkey"))
      highValue.unionByName(urgent).unionByName(all)
        .orderBy(col("type"), col("o_orderkey"))
    }),

    // P4 "to-links": each base record collects its ordered linked rows
    // (add_links.py:99-157: join + order_by + attach list).
    "p4_add_links_to" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_links"),
          concat_ws(",", sort_array(collect_list(
            concat_ws(":", col("l_linenumber"), col("l_partkey"))))).as("items"))
        .orderBy(col("o_orderkey"))
    }),

    // P4 "alert_match": equality on the last-N characters of the uuid
    // (add_links.py:79-82 — substring(uuid, 42-len, len) == alert_id).
    "p4_add_links_alert_match" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .filter(length(col("c_custkey").cast("string")) === 3)
        .select(col("c_custkey"), col("c_custkey").cast("string").as("alert_id"))
      val ord = Tables.orders(s, dir)
        .filter(length(col("o_orderkey").cast("string")) >= 3)
        .select(col("o_orderkey"),
          substring(col("o_orderkey").cast("string"), -3, 3).as("suffix"))
      cust.join(ord, col("alert_id") === col("suffix"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_matches"),
          min(col("o_orderkey")).as("first_match"),
          max(col("o_orderkey")).as("last_match"))
        .orderBy(col("c_custkey"))
    }),

    // A1: per-clinic (user) daily tumbling-window count over a variable,
    // alert where count >= limit; contributing uuids collected.
    "a1_daily_threshold" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          concat_ws(",", sort_array(collect_list(col("event_id").cast("string"))))
            .as("uuids"))
        .filter(col("n") >= 5)
        .orderBy(col("user_id"), col("day"))
    }),

    // A2: epi-week-aligned weekly threshold (international policy).
    "a2_weekly_threshold" -> ((s, dir) => {
      import graft.functions.EpiWeek
      val yw = EpiWeek.epiYearWeek(col("ts"), EpiWeek.International)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          yw.getField("epi_year").as("epi_year"),
          yw.getField("epi_week").as("epi_week"))
        .groupBy(col("user_id"), col("epi_year"), col("epi_week"))
        .agg(count(lit(1)).as("n"),
          concat_ws(",", sort_array(collect_list(col("event_id").cast("string"))))
            .as("uuids"))
        .filter(col("n") >= 20)
        .orderBy(col("user_id"), col("epi_year"), col("epi_week"))
    }),

    // A3: double-doubling — weekly counts per (user, variable); alert when
    // counts double across two consecutive week pairs. lag() over a
    // monotonic week index replaces the reference's ±52 manual fixups.
    "a3_double_doubling" -> ((s, dir) => {
      import graft.functions.EpiWeek
      val yw = EpiWeek.epiYearWeek(col("ts"), EpiWeek.International)
      val weekly = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          yw.getField("epi_year").as("epi_year"),
          yw.getField("epi_week").as("epi_week"))
        .groupBy(col("user_id"), col("event_type"), col("epi_year"), col("epi_week"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("epi_year"), col("epi_week"))
      weekly
        .withColumn("l1", lag(col("n"), 1).over(w))
        .withColumn("l2", lag(col("n"), 2).over(w))
        .filter(col("n") >= col("l1") * 2 && col("l1") >= col("l2") * 2 && col("l2") >= 1)
        .select(col("user_id"), col("event_type"), col("epi_year"), col("epi_week"),
          col("n"), col("l1"), col("l2"))
        .orderBy(col("user_id"), col("event_type"), col("epi_year"), col("epi_week"))
    }),

    // A4: alert representative selection — within each alert group the
    // smallest uuid becomes the representative; the rest become sub-alerts
    // pointing at it (add_multiple_alerts.py:78-143).
    "a4_alert_representative" -> ((s, dir) => {
      val withDay = Tables.events(s, dir)
        .withColumn("day", to_date(col("ts")))
      val w = Window.partitionBy(col("user_id"), col("day"))
      withDay
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("n") >= 5)
        .withColumn("master_alert", min(col("event_id")).over(w))
        .select(col("event_id"), col("user_id"), col("day"),
          when(col("event_id") === col("master_alert"), lit("rep"))
            .otherwise(lit("sub")).as("role"),
          col("master_alert"))
        .orderBy(col("event_id"))
    }),

    // Analytic window-function surface: running totals, ranks, quartiles —
    // the generic per-entity history queries downstream consumers run.
    "q_window_analytics" -> ((s, dir) => {
      val wOrder = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRank = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, dir)
        .withColumn("running_value",
          sum(col("value").cast("decimal(18,2)"))
            .over(wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .withColumn("value_rank", rank().over(wRank))
        .withColumn("quartile", ntile(4).over(wOrder))
        .select(col("event_id"), col("user_id"), col("running_value"),
          col("value_rank"), col("quartile"))
        .orderBy(col("event_id"))
    }),

    // A5: hierarchical population rollup (clinic→district→…→country):
    // fixed-depth level-wise aggregation, one output row per node per level.
    "a5_population_rollup" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = broadcast(Tables.nation(s, dir))
      val r = broadcast(Tables.region(s, dir))
      val base = c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
      val nationLevel = base.groupBy(col("n_name").as("name"))
        .agg(sum(dec(col("c_acctbal"))).cast("double").as("pop"))
        .withColumn("level", lit("nation"))
      val regionLevel = base.groupBy(col("r_name").as("name"))
        .agg(sum(dec(col("c_acctbal"))).cast("double").as("pop"))
        .withColumn("level", lit("region"))
      nationLevel.unionByName(regionLevel)
        .select(col("level"), col("name"), col("pop"))
        .orderBy(col("level"), col("name"))
    }),

    // A6: multiple_link aggregation semantics over linked rows:
    // count / any / all / first / last (codes/to_codes.py:217-242).
    "a6_multiple_link" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(
          count(lit(1)).as("n_links"),
          expr("bool_or(l_discount >= 0.05)").as("any_high_disc"),
          expr("bool_and(l_shipdate > o_orderdate)").as("all_shipped_after"),
          // order key must be unique up to identical output values, else
          // min_by/max_by tie-break nondeterministically (l_linenumber alone
          // is NOT unique per order in this data)
          expr("min_by(l_partkey, l_linenumber * 100000 + l_partkey)").as("first_part"),
          expr("max_by(l_partkey, l_linenumber * 100000 + l_partkey)").as("last_part"))
        .orderBy(col("o_orderkey"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "p1_quality_control" ->
      """SELECT event_id, user_id, event_type,
        |  CASE WHEN value >= 0 AND value < 500 THEN value ELSE NULL END AS value_r
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03'
        |  AND event_type <> 'signup'
        |  AND event_id NOT IN (SELECT event_id FROM events WHERE event_id % 101 = 0)
        |ORDER BY event_id""".stripMargin,

    "p2_initial_visit_control" ->
      """SELECT event_id, user_id, event_type,
        |  CASE WHEN row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
        |       THEN 'new' ELSE 'return' END AS visit
        |FROM events ORDER BY event_id""".stripMargin,

    "p3_to_data_type" ->
      """SELECT * FROM (
        |  SELECT 'high_value' AS type, o_orderkey FROM orders WHERE o_totalprice >= 250000
        |  UNION ALL
        |  SELECT 'urgent' AS type, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT 'all_orders' AS type, o_orderkey FROM orders)
        |ORDER BY type, o_orderkey""".stripMargin,

    "p4_add_links_to" ->
      """SELECT o_orderkey, count(*) AS n_links,
        |  string_agg(CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR), ','
        |             ORDER BY CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR)) AS items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "p4_add_links_alert_match" ->
      """SELECT c_custkey, count(*) AS n_matches,
        |  min(o_orderkey) AS first_match, max(o_orderkey) AS last_match
        |FROM customer
        |JOIN orders ON CAST(c_custkey AS VARCHAR) = right(CAST(o_orderkey AS VARCHAR), 3)
        |WHERE length(CAST(c_custkey AS VARCHAR)) = 3
        |  AND length(CAST(o_orderkey AS VARCHAR)) >= 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "a1_daily_threshold" ->
      """SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
        |  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY CAST(event_id AS VARCHAR)) AS uuids
        |FROM events GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY 1, 2""".stripMargin,

    "a2_weekly_threshold" ->
      """SELECT user_id,
        |  CAST(year(ts) AS INT) AS epi_year,
        |  CAST((dayofyear(ts) - 1) // 7 + 1 AS INT) AS epi_week,
        |  count(*) AS n,
        |  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY CAST(event_id AS VARCHAR)) AS uuids
        |FROM events GROUP BY 1, 2, 3 HAVING count(*) >= 20
        |ORDER BY 1, 2, 3""".stripMargin,

    "a3_double_doubling" ->
      """WITH weekly AS (
        |  SELECT user_id, event_type,
        |    CAST(year(ts) AS INT) AS epi_year,
        |    CAST((dayofyear(ts) - 1) // 7 + 1 AS INT) AS epi_week,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2, 3, 4),
        |lagd AS (
        |  SELECT *,
        |    lag(n, 1) OVER (PARTITION BY user_id, event_type ORDER BY epi_year, epi_week) AS l1,
        |    lag(n, 2) OVER (PARTITION BY user_id, event_type ORDER BY epi_year, epi_week) AS l2
        |  FROM weekly)
        |SELECT user_id, event_type, epi_year, epi_week, n, l1, l2
        |FROM lagd
        |WHERE n >= l1 * 2 AND l1 >= l2 * 2 AND l2 >= 1
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "a4_alert_representative" ->
      """WITH g AS (
        |  SELECT event_id, user_id, CAST(ts AS DATE) AS day,
        |    count(*) OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS n,
        |    min(event_id) OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS master_alert
        |  FROM events)
        |SELECT event_id, user_id, day,
        |  CASE WHEN event_id = master_alert THEN 'rep' ELSE 'sub' END AS role,
        |  master_alert
        |FROM g WHERE n >= 5 ORDER BY event_id""".stripMargin,

    "q_window_analytics" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        |  rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank,
        |  ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile
        |FROM events ORDER BY event_id""".stripMargin,

    "a5_population_rollup" ->
      """SELECT * FROM (
        |  SELECT 'nation' AS level, n_name AS name,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS pop
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 2
        |  UNION ALL
        |  SELECT 'region' AS level, r_name AS name,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS pop
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 2)
        |ORDER BY level, name""".stripMargin,

    "a6_multiple_link" ->
      """SELECT o_orderkey, count(*) AS n_links,
        |  bool_or(l_discount >= 0.05) AS any_high_disc,
        |  bool_and(l_shipdate > o_orderdate) AS all_shipped_after,
        |  min_by(l_partkey, l_linenumber * 100000 + l_partkey) AS first_part,
        |  max_by(l_partkey, l_linenumber * 100000 + l_partkey) AS last_part
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
