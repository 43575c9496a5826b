package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.CodeDef
import graft.functions.{ColumnResolver, VariableCompiler, EpiWeek}
import graft.functions.EpiWeek.YearStartPolicy

/** The core rule-engine projection (reference codes/to_codes.py:78-310 +
  * process_steps/to_codes.py:32-152): evaluate the whole code catalog against
  * each record and emit the `variables` / `categories` maps, alert tagging and
  * the disregard flag — as ONE wide `select` over compiled `when()` chains.
  *
  * Scale notes: everything here is a narrow projection — no shuffle, no UDF;
  * hundreds of codes become hundreds of branches inside whole-stage codegen
  * (the reference's hash-dispatch fast path for single-`match` codes —
  * to_codes.py:38-49 — is subsumed by CaseWhen branch chains in generated
  * code). Catalyst prunes the read schema down to the columns the catalog
  * actually references.
  *
  * Semantics preserved:
  *  - calculation_group mutual exclusion: first applicable code in the group
  *    wins, the rest are skipped (to_codes.py:305-306) → CaseWhen chain.
  *  - calculation_priority: within a group where any member declares a
  *    priority, the loop does NOT break — every applicable member still
  *    contributes categories/alert/disregard; only the variables-map key is
  *    priority-gated: numerically LOWEST priority wins, ties keep the earlier
  *    catalog entry (to_codes.py:260-282's overwrite loop ≡ min over
  *    (priority, index)).
  *  - categories: each hit writes category → its id; later groups
  *    overwrite on key collision (dict.update ≡ LAST_WIN map dedup).
  *  - alert: a winning code with alert & alert_type=="individual" injects
  *    alert=1, alert_type, alert_reason=<code id> and alert_<k>=row[col] for
  *    the configured alert_data columns (to_codes.py:292-301).
  *  - disregard: a winning disregard code routes the record out — but only if
  *    an individual alert also fired (to_codes.py:302-309).
  */
object ToCodes {

  /** Outcome of one code, honoring multiple_link aggregation over linked
    * rows (codes/to_codes.py:217-242): a code whose form is a *linked* form
    * evaluates against `links[linkName]` with method last / first / count /
    * any / all instead of the main record. */
  private def compiledFor(code: CodeDef, r: ColumnResolver,
                          policy: YearStartPolicy,
                          linkNameForForm: Map[String, String]): VariableCompiler.Compiled = {
    linkNameForForm.get(code.form) match {
      case None => VariableCompiler.compile(code, r, policy)
      case Some(linkName) =>
        val arr = element_at(col("links"), linkName)
        def over(elem: Column) =
          VariableCompiler.compile(code, new graft.functions.MapResolver(elem), policy)
        val present = arr.isNotNull && size(arr) > 0
        code.multipleLink.getOrElse("last") match {
          case "last"  =>
            val c = over(element_at(arr, -1))
            VariableCompiler.Compiled(present && c.applicable, c.value)
          case "first" =>
            val c = over(element_at(arr, 1))
            VariableCompiler.Compiled(present && c.applicable, c.value)
          case "count" =>
            VariableCompiler.Compiled(present, size(arr).cast("string"))
          case "any"   =>
            VariableCompiler.Compiled(
              present && exists(arr, m => over(m).applicable), lit("1"))
          case "all"   =>
            VariableCompiler.Compiled(
              present && forall(arr, m => over(m).applicable), lit("1"))
          case other =>
            throw new IllegalArgumentException(s"bad multiple_link $other")
        }
    }
  }

  /** Hits contributed by one mutual-exclusion group, or null when no member
    * applies. Each hit struct carries a `winner` flag: only the flagged hit
    * writes the variables-map entry; categories / alert / disregard aggregate
    * over EVERY hit.
    *
    * Priority groups (to_codes.py:260-309): the reference loop does NOT
    * `break` when the group declares calculation_priority — every applicable
    * member writes its categories, fires its individual alert (alert_reason =
    * last applicable alerting member) and can set disregard; only the
    * variables-map key is priority-gated (numerically lowest priority wins,
    * ties keep the earlier catalog entry). Non-priority groups break on the
    * first applicable member, so they emit exactly one hit. */
  private def groupHits(group: Seq[(CodeDef, Int)], r: ColumnResolver,
                        policy: YearStartPolicy,
                        linkNameForForm: Map[String, String]): Column = {
    val hasPriority = group.exists(_._1.calculationPriority.isDefined)
    // winner column appended LAST so both branches produce the same shape
    // (withField on a CaseWhen struct trips ReplaceUpdateFieldsExpression
    // plan validation in Spark 4 — build the field in directly instead)
    val members = group.map { case (code, idx) =>
      val c = compiledFor(code, r, policy, linkNameForForm)
      def mk(winner: Option[Column]) = struct(Seq(
        lit(code.calculationPriority.getOrElse(Int.MaxValue)).as("priority"),
        lit(idx).as("idx"),
        lit(code.id).as("id"),
        c.value.cast("string").as("value"),
        array(code.category.map(lit): _*).as("cats"),
        lit(code.alert && code.alertType == "individual").as("alert"),
        lit(code.disregard).as("disregard")) ++
        winner.map(_.as("winner")): _*)
      (c.applicable, mk _)
    }
    if (hasPriority) {
      // all applicable members contribute; min (priority, idx) is the winner
      val candidates = filter(
        array(members.map { case (a, mk) => when(a, mk(None)) }: _*),
        x => x.isNotNull)
      val win = array_min(candidates)
      when(size(candidates) > 0,
        transform(candidates, x =>
          x.withField("winner", x.getField("idx") === win.getField("idx"))))
    } else {
      // first applicable wins — CaseWhen short-circuits like the `break`
      val flagged = members.map { case (a, mk) => (a, mk(Some(lit(true)))) }
      val w = flagged.tail.foldLeft(when(flagged.head._1, flagged.head._2)) {
        case (acc, (a, s)) => acc.when(a, s)
      }
      when(w.isNotNull, array(w))
    }
  }

  /** Compiled output columns for a code catalog against one row shape. */
  final case class Outputs(variables: Column, categories: Column, disregard: Column)

  /** @param alertData name → source column for alert_<name> context values
    *                  (country_config/demo_config.py:148-155) */
  def outputs(codes: Seq[CodeDef], r: ColumnResolver,
              policy: YearStartPolicy = EpiWeek.International,
              alertData: Map[String, String] = Map.empty,
              linkNameForForm: Map[String, String] = Map.empty): Outputs = {
    val emptyMap = map_from_entries(
      array().cast("array<struct<key:string,value:string>>"))
    if (codes.isEmpty)
      return Outputs(emptyMap, emptyMap, lit(false))
    outputsFromHits(hitsColumn(codes, r, policy, linkNameForForm), r, alertData)
  }

  /** The per-row array of hits (winner-flagged structs) — the ONE expensive
    * expression. Callers materialize it into a column before fanning out to
    * variables/categories/disregard (which reference it ~6×; without
    * materialization interpreted evaluation re-runs the whole catalog per
    * output — measured 30×+ slowdown on the 198-code demo catalog). */
  def hitsColumn(codes: Seq[CodeDef], r: ColumnResolver,
                 policy: YearStartPolicy,
                 linkNameForForm: Map[String, String] = Map.empty): Column = {
    // group by calculation_group, preserving catalog order (to_codes.py:33-36:
    // ungrouped codes form singleton groups)
    val indexed = codes.zipWithIndex
    val grouped = scala.collection.mutable.LinkedHashMap.empty[String, Vector[(CodeDef, Int)]]
    indexed.foreach { case (c, i) =>
      val g = c.calculationGroup.getOrElse(s"__singleton_${c.id}")
      grouped(g) = grouped.getOrElse(g, Vector.empty) :+ ((c, i))
    }
    val groupArrays = array(grouped.values
      .map(g => groupHits(g.toSeq, r, policy, linkNameForForm)).toSeq: _*)
    flatten(filter(groupArrays, a => a.isNotNull))
  }

  /** Build the output maps from a (preferably materialized) hits column.
    * @param staticEntries constant key→value pairs folded into the same map
    *        build (the per-type counters — process_steps/to_codes.py:106-108 —
    *        would otherwise cost a whole-map copy via map_concat per row) */
  def outputsFromHits(hits: Column, r: ColumnResolver,
                      alertData: Map[String, String],
                      staticEntries: Seq[(String, String)] = Nil): Outputs = {
    // only the per-group winner writes its variables-map entry; categories /
    // alert / disregard below aggregate over every hit (to_codes.py:260-309)
    val baseEntries0 = transform(filter(hits, w => w.getField("winner")), w =>
      struct(w.getField("id").as("key"), w.getField("value").as("value")))
    val baseEntries =
      if (staticEntries.isEmpty) baseEntries0
      else concat(baseEntries0, array(staticEntries.map { case (k, v) =>
        struct(lit(k).as("key"), lit(v).as("value")) }: _*))

    // alert injection: reference iterates groups in order and each alert hit
    // overwrites alert_reason — the LAST alert-firing winner is visible
    val alertHits = filter(hits, w => w.getField("alert"))
    val anyAlert = size(alertHits) > 0
    val alertReason = element_at(alertHits, -1).getField("id")
    val alertEntries: Seq[Column] =
      Seq(
        struct(lit("alert").as("key"), lit("1").as("value")),
        struct(lit("alert_type").as("key"), lit("individual").as("value")),
        struct(lit("alert_reason").as("key"), alertReason.as("value"))) ++
      alertData.toSeq.map { case (name, column) =>
        struct(lit(s"alert_$name").as("key"), r.get(column).as("value"))
      }
    val allEntries = when(anyAlert,
        concat(baseEntries, array(alertEntries: _*)))
      .otherwise(baseEntries)
    // map_from_entries + LAST_WIN dedup ≡ dict insert order semantics
    val variables = map_from_entries(allEntries)

    val catEntries = flatten(transform(hits, w =>
      transform(w.getField("cats"), c =>
        struct(c.as("key"), w.getField("id").as("value")))))
    val categories = when(size(catEntries) > 0, map_from_entries(catEntries))
      .otherwise(map_from_entries(array().cast("array<struct<key:string,value:string>>")))

    val anyDisregard = exists(hits, w => w.getField("disregard"))
    val disregard = anyDisregard && anyAlert

    Outputs(variables, categories, disregard)
  }

  /** Append variables/categories/disregard columns to `df`.
    *
    * Two-stage evaluation for catalog-scale performance:
    *  1. every distinct referenced form column is projected ONCE into a bound
    *     attribute (a 200-code catalog references ~40 distinct columns —
    *     without this each code repeats its own map lookups);
    *  2. the winner array is materialized into a column so the catalog
    *     evaluates once per row, with variables/categories/disregard reading
    *     the materialized result.
    */
  def apply(df: DataFrame, codes: Seq[CodeDef], r: ColumnResolver,
            policy: YearStartPolicy = EpiWeek.International,
            alertData: Map[String, String] = Map.empty,
            linkNameForForm: Map[String, String] = Map.empty,
            staticEntries: Seq[(String, String)] = Nil): DataFrame = {
    if (codes.isEmpty) {
      val o = outputs(codes, r, policy, alertData, linkNameForForm)
      val vars =
        if (staticEntries.isEmpty) o.variables
        else map(staticEntries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      return df.withColumn("variables", vars)
        .withColumn("categories", o.categories)
        .withColumn("disregard", o.disregard)
    }
    // names must stay verbatim (no trim): the compiler resolves by the exact
    // strings columnsPerTerm yields
    val mainCols = (codes
      .filter(c => !linkNameForForm.contains(c.form))
      .flatMap(_.columnsPerTerm.flatten) ++ alertData.values)
      .filter(_.nonEmpty).distinct
    val attrMap = mainCols.zipWithIndex
      .map { case (c, i) => c -> s"__tc_c$i" }.toMap
    val projected = attrMap.foldLeft(df) { case (acc, (name, attr)) =>
      acc.withColumn(attr, r.get(name))
    }
    val br = new graft.functions.BoundResolver(attrMap)
    val withHits = projected.withColumn("__tc_hits",
      hitsColumn(codes, br, policy, linkNameForForm))
    val o = outputsFromHits(col("__tc_hits"), br, alertData, staticEntries)
    withHits
      .withColumn("variables", o.variables)
      .withColumn("categories", o.categories)
      .withColumn("disregard", o.disregard)
      .drop(attrMap.values.toSeq :+ "__tc_hits": _*)
  }
}
