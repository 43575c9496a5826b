package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization / redaction for corpus cleaning — the scrub pass that
  * runs before dedup and quality scoring in a training-data pipeline.
  *
  * All pure `regexp_replace` / `regexp_count` projections (codegen'd, no
  * shuffle). Patterns deliberately stay in the portable regex subset that
  * Java (Spark) and RE2 (DuckDB et al.) treat identically, so the results
  * are engine-checkable like everything else here.
  */
object TextNormalize {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ \\t\\n]+"
  val TagPattern = "<[^<>]+>"

  /** Drop HTML/XML-ish tags (best-effort tag-shaped token removal — not a
    * parser; nested/malformed markup beyond `<...>` shapes passes through). */
  def stripTags(text: Column): Column =
    regexp_replace(text, TagPattern, " ")

  /** Replace email addresses with a redaction token. */
  def redactEmails(text: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(text, EmailPattern, token)

  /** Replace URLs with a redaction token. */
  def redactUrls(text: Column, token: String = "<URL>"): Column =
    regexp_replace(text, UrlPattern, token)

  /** Collapse runs of whitespace to single spaces and trim. */
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "[ \\t\\n]+", " "))

  /** The standard scrub: strip tags, redact emails+URLs, collapse
    * whitespace. */
  def scrub(text: Column): Column =
    collapseWhitespace(redactUrls(redactEmails(stripTags(text))))

  /** How many redactions each pattern would make (reporting columns). */
  def redactionCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailPattern)),
    "n_urls" -> regexp_count(text, lit(UrlPattern)),
    "n_tags" -> regexp_count(text, lit(TagPattern)))
}
