package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based curation with an AUDIT TRAIL — the Dolma-style "mixer"
  * step: a corpus filter is a list of named rules, and every dropped
  * document records WHY, so filter decisions are reproducible,
  * ablatable, and debuggable (which rule killed this doc? what does
  * each rule cost on top of the others?).
  *
  * Design for 100 TB: both operators are single-pass. The provenance
  * tagger is a pure codegen'd projection (static per-rule predicate
  * columns — no explode, no shuffle, streaming-safe by construction);
  * the ablation report is ONE narrow aggregation producing a
  * rules-sized row that unpivots driver-free through a static struct
  * array. Rule predicates evaluate scan-side, so column pruning and
  * predicate pushdown still apply to whatever feeds them.
  */
object Curation {

  /** Tag every document with its filter outcome: `keep` (passes ALL
    * rules), `n_fails`, `fail_reasons` (the '|'-joined names of failed
    * rules, in rule order — string-typed so any engine compares it
    * byte-for-byte), and `first_fail` (the first failed rule's name,
    * null when kept). Rules are ordered (name, pass-predicate) pairs;
    * names must be unique and '|'-free. Keeping EVERY row tagged — not
    * dropping — is the contract: downstream gates filter on `keep`,
    * ablation reads the reasons, and "clean" is an answer. */
  private def validateRules(rules: Seq[(String, Column)]): Unit = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.forall(_._1.nonEmpty), "rule names must be non-empty")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    require(rules.forall(!_._1.contains("|")),
      "rule names must not contain '|' (the reason separator)")
  }

  def filterWithProvenance(docs: DataFrame,
                           rules: Seq[(String, Column)]): DataFrame = {
    validateRules(rules)
    val reserved = Seq("keep", "n_fails", "fail_reasons", "first_fail",
      "__fr")
    require(!docs.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by filterWithProvenance")
    // a failed predicate contributes its name; nulls count as FAILURES
    // (a rule that cannot evaluate must not silently pass a document)
    val failed = rules.map { case (n, p) =>
      when(coalesce(p, lit(false)), array().cast("array<string>"))
        .otherwise(array(lit(n)))
    }
    docs
      .withColumn("__fr", concat(failed: _*))
      .withColumn("n_fails", size(col("__fr")).cast("int"))
      .withColumn("keep", col("n_fails") === 0)
      .withColumn("fail_reasons", concat_ws("|", col("__fr")))
      .withColumn("first_fail", get(col("__fr"), lit(0)))
      .drop("__fr")
  }

  /** The rule-tuning table: per rule, how many documents fail it
    * (`n_fail`), how many ONLY it kills (`n_unique_fail` — what the
    * corpus gains if this rule is dropped), and how many the rule
    * PREFIX up to it kills (`n_cum_killed` — the kill curve in rule
    * order), plus the corpus size. One narrow aggregation over the
    * tagged frame; the per-rule rows unpivot through a static struct
    * array (rules-sized, no shuffle beyond the single agg). */
  def filterAblation(docs: DataFrame,
                     rules: Seq[(String, Column)]): DataFrame = {
    validateRules(rules)
    // counts straight from the predicates (same null-counts-as-failure
    // contract as the tagger: coalesce(p, false)) — no string round-trip
    // through fail_reasons
    val pass = rules.map { case (_, p) => coalesce(p, lit(false)) }
    val aggs = count(lit(1)).as("__n") +: rules.indices.toSeq.flatMap { i =>
      val othersPass = rules.indices.filter(_ != i).map(pass)
        .reduceOption(_ && _).getOrElse(lit(true))
      val prefixPass = (0 to i).map(pass).reduce(_ && _)
      Seq(
        sum(when(!pass(i), 1L).otherwise(0L)).as(s"__f$i"),
        sum(when(!pass(i) && othersPass, 1L).otherwise(0L)).as(s"__u$i"),
        sum(when(!prefixPass, 1L).otherwise(0L)).as(s"__c$i"))
    }
    val row = docs.agg(aggs.head, aggs.tail: _*)
    val entries = rules.map(_._1).zipWithIndex.map { case (n, i) =>
      struct(lit(n).as("rule"), lit(i).as("rule_idx"),
        col(s"__f$i").as("n_fail"), col(s"__u$i").as("n_unique_fail"),
        col(s"__c$i").as("n_cum_killed"), col("__n").as("n_docs"))
    }
    row.select(explode(array(entries: _*)).as("__e")).select(col("__e.*"))
  }
}
