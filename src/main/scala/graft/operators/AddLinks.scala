package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.LinkDef
import graft.functions.VariableCompiler

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
  */
object AddLinks {

  private def normalize(c: Column): Column = lower(regexp_replace(c, "-", "_"))

  /** (uuid → ordered linked-data array) for one link spec. */
  def linkMatches(base: DataFrame, linked: DataFrame, link: LinkDef,
                  alertIdLength: Int): DataFrame = {
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
    // array_sort with an explicit comparator on the key field — struct-wide
    // ordering is unavailable because the payload is a map
    val cmp = (l: Column, r: Column) => {
      val (lk, rk) = (l.getField("k"), r.getField("k"))
      when(lk.isNull && rk.isNull, 0)
        .when(lk.isNull, 1).when(rk.isNull, -1)
        .when(lk < rk, -1).when(lk > rk, 1).otherwise(0)
    }
    joined
      .groupBy(col("__b_uuid").as("uuid"))
      .agg(transform(
        array_sort(collect_list(struct(orderKey.as("k"), col("__l_data").as("d"))), cmp),
        e => e.getField("d")).as("__linked"))
  }

  /** Attach `links: map<string, array<map<string,string>>>` to `base`,
    * covering every link spec for this data type. */
  def apply(base: DataFrame, forms: Map[String, DataFrame], links: Seq[LinkDef],
            alertIdLength: Int = 6): DataFrame = {
    val emptyLinks = map_from_entries(
      array().cast("array<struct<key:string,value:array<map<string,string>>>>"))
    links.foldLeft(base.withColumn("links", emptyLinks)) { (acc, link) =>
      val matches = linkMatches(base, forms(link.toForm), link, alertIdLength)
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
