package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.{CodeDef, LinkDef}
import graft.functions.{EpiWeek, MapResolver, VariableCompiler}
import graft.functions.EpiWeek.YearStartPolicy

/** add_links step (reference
  * pipeline_worker/process_steps/add_links.py:28-157): record linkage between
  * a data type's base records and its linked forms.
  *
  * Per (from_column, to_column, method) triple the join predicate is:
  *   match       → equality on the raw values
  *   lower_match → equality on lower(replace(x, '-', '_'))
  *   alert_match → linked value == last-`alert_id_length` chars of base value
  *                 (the reference's substring(uuid, 42-len, len))
  * plus a non-empty guard on the linked value and an optional to_condition
  * filter. Matches are ordered by the link's order_by column (date-parsed or
  * lexical) and attached as `links[link_name] = [linked data …]`.
  *
  * The reference's "from-links" (a linked-form record re-emitting the base
  * records it points at — add_links.py:45-97) exist because its pipeline is
  * incremental; a batch recompute of to-links over base ∪ linked forms
  * produces exactly that closure, so this operator only implements the
  * set-based direction.
  *
  * Scale: one shuffle per link on the join key; the equality methods are all
  * equi-joins (alert_match included — the substring is computed into the join
  * key), so Catalyst picks hash joins and can broadcast small linked forms.
  *
  * Ordering is a SECONDARY SORT, not a post-aggregation `array_sort` with a
  * comparator lambda: lambda HOFs are CodegenFallback, and one of them in the
  * link-assembly projection forced the whole stage interpreted (measured 29×
  * on the p4 gate). Instead the join output is hash-repartitioned on the
  * group key and sorted within partitions by (key, order_by); the
  * aggregation's required distribution is already satisfied, so
  * `collect_list` rides the same single shuffle the groupBy needed anyway and
  * appends rows per group in sorted order — arrays come out ordered with
  * every expression codegen'd. (`EliminateSorts` keeps the sort: the
  * aggregate contains collect_list, which is order-sensitive.)
  *
  * `multiple_link` any/all codes (codes/to_codes.py:217-242) are evaluated
  * here too, as `bool_or` / `bool_and` aggregations over the UNCOLLECTED join
  * rows ([[linkCodeAggs]]): the five reference aggregation methods are all
  * expressible at link-build time (count = size, first/last = element_at ±1,
  * any/all = bool_or/bool_and), so ToCodes never needs an `exists`/`forall`
  * lambda over the collected arrays on the hot path.
  */
object AddLinks {

  private def normalize(c: Column): Column = lower(regexp_replace(c, "-", "_"))

  /** Column name carrying the pre-aggregated any/all outcome of one
    * multiple_link code; consumed (and dropped) by ToCodes. */
  def aggColName(codeId: String): String = s"__lc_$codeId"

  /** `bool_or`/`bool_and` aggregation columns for the any/all multiple_link
    * codes that target this link's form. The code's predicate is compiled
    * against the pre-aggregation linked row (`__l_data`), where it is a
    * plain codegen'd column expression — the lambda-free equivalent of
    * `exists`/`forall` over the collected array.
    *
    * Null predicate outcomes fold to false first: `forall([true, null])` is
    * null (falsy downstream) while `bool_and` skips nulls, so the coalesce
    * keeps the two formulations identical. */
  def linkCodeAggs(codes: Seq[CodeDef], link: LinkDef,
                   policy: YearStartPolicy): Seq[Column] = {
    val r = new MapResolver(col("__l_data"))
    codes.filter(_.form == link.toForm).flatMap { c =>
      def pred = coalesce(VariableCompiler.compile(c, r, policy).applicable,
        lit(false))
      c.multipleLink match {
        case Some("any") => Some(bool_or(pred).as(aggColName(c.id)))
        case Some("all") => Some(bool_and(pred).as(aggColName(c.id)))
        case _           => None
      }
    }
  }

  /** (uuid → ordered linked-data array) for one link spec, plus any
    * `extraAggs` evaluated over the pre-collection join rows. */
  def linkMatches(base: DataFrame, linked: DataFrame, link: LinkDef,
                  alertIdLength: Int,
                  extraAggs: Seq[Column] = Nil): DataFrame = {
    val b = base.select(col("uuid").as("__b_uuid"), col("data").as("__b_data"))
    val l = linked.select(col("data").as("__l_data"))

    val conds: Seq[Column] =
      link.fromColumns.lazyZip(link.toColumns).lazyZip(link.methods).map {
        (fc, tc, m) =>
          val bv = element_at(col("__b_data"), fc)
          val lv = element_at(col("__l_data"), tc)
          val eq = m match {
            case "match"       => lv === bv
            case "lower_match" => normalize(lv) === normalize(bv)
            case "alert_match" => lv === substring(bv, -alertIdLength, alertIdLength)
            case other => throw new IllegalArgumentException(s"bad link method $other")
          }
          eq && lv =!= ""
      }
    val toCond: Column = link.toCondition
      .map { case (c, v) => element_at(col("__l_data"), c) === v }
      .getOrElse(lit(true))
    val fromCond: Column = link.fromCondition
      .map { case (c, v) => element_at(col("__b_data"), c) === v }
      .getOrElse(lit(true))

    val joined = b.join(l, conds.reduce(_ && _) && toCond && fromCond, "inner")
    val orderKey = {
      val raw = element_at(col("__l_data"), link.orderByColumn)
      if (link.orderByIsDate) VariableCompiler.parseDate(raw).cast("string") else raw
    }
    // secondary sort (see object doc): null order keys last, matching the
    // reference's None-sorts-last comparator
    joined
      .select(col("__b_uuid"), orderKey.as("__ok"), col("__l_data"))
      .repartition(col("__b_uuid"))
      .sortWithinPartitions(col("__b_uuid"), col("__ok").asc_nulls_last)
      .groupBy(col("__b_uuid").as("uuid"))
      .agg(collect_list(col("__l_data")).as("__linked"), extraAggs: _*)
  }

  /** Attach `links: map<string, array<map<string,string>>>` to `base`,
    * covering every link spec for this data type.
    *
    * @param linkCodes multiple_link codes of this data type whose form is a
    *        LINKED form — their any/all outcomes are pre-aggregated into
    *        `__lc_<id>` boolean columns that ToCodes consumes instead of
    *        running exists/forall over the arrays. */
  def apply(base: DataFrame, forms: Map[String, DataFrame], links: Seq[LinkDef],
            alertIdLength: Int = 6,
            linkCodes: Seq[CodeDef] = Nil,
            policy: YearStartPolicy = EpiWeek.International): DataFrame = {
    val emptyLinks = map_from_entries(
      array().cast("array<struct<key:string,value:array<map<string,string>>>>"))
    links.foldLeft(base.withColumn("links", emptyLinks)) { (acc, link) =>
      val matches = linkMatches(base, forms(link.toForm), link, alertIdLength,
        linkCodeAggs(linkCodes, link, policy))
        .withColumnRenamed("uuid", "__m_uuid")
      acc.join(matches, col("uuid") === col("__m_uuid"), "left")
        .withColumn("links",
          when(col("__linked").isNotNull,
            map_concat(col("links"), map(lit(link.name), col("__linked"))))
            .otherwise(col("links")))
        .drop("__m_uuid", "__linked")
    }
  }
}
