package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Dotted-quad IPv4 with range-valid octets (0-255), word-bounded so a
    * longer digit run (a version string `1.2.3.4.5`'s interior) can't start
    * a match mid-number. */
  val Ipv4Pattern =
    "\\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])" +
      "(\\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\\b"

  /** Phone numbers in the two shapes that dominate scraped text: E.164-ish
    * (`+` then 7-15 digits) and separator-grouped 3-3-4 (`555-123-4567`,
    * dots or dashes). Deliberately narrow — a bare 10-digit run is left
    * alone (it's usually an id, not a phone). */
  val PhonePattern =
    "\\+[0-9]{7,15}\\b|\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

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

  /** Replace IPv4 addresses with a redaction token. */
  def redactIps(text: Column, token: String = "<IP>"): Column =
    regexp_replace(text, Ipv4Pattern, token)

  /** Replace phone numbers with a redaction token. */
  def redactPhones(text: Column, token: String = "<PHONE>"): Column =
    regexp_replace(text, PhonePattern, token)

  /** The standard scrub: strip tags, redact emails+URLs, collapse
    * whitespace. */
  def scrub(text: Column): Column =
    collapseWhitespace(redactUrls(redactEmails(stripTags(text))))

  /** Consistent pseudonymization (L140): every `pattern` match becomes
    * the STABLE token `<tag_xxxxxxxx>` (first 8 md5 hex digits of the
    * match) — same entity, same token, corpus-wide, with zero
    * coordination (the id is a pure function of the entity, so this is a
    * zero-shuffle codegen'd projection and ids survive corpus growth).
    * The coreference-preserving upgrade of [[scrubPii]]'s constant tags.
    * See [[graft.functions.Pseudonymize]] for the native kernel. */
  def pseudonymize(text: Column, pattern: String = EmailPattern,
                   tag: String = "email"): Column =
    graft.functions.Pseudonymize.pseudonymize(text, pattern, tag)

  /** The full PII scrub: [[scrub]] plus IPv4 and phone redaction — the
    * standard redaction list for training corpora. Order matters: URLs go
    * before IPs (a URL host that is an IP is redacted as a URL, whole),
    * and IPs before phones (so the dotted 3-3-4 phone shape can never eat
    * part of a dotted quad). */
  def scrubPii(text: Column): Column =
    collapseWhitespace(redactPhones(redactIps(
      redactUrls(redactEmails(stripTags(text))))))

  /** How many redactions each pattern would make (reporting columns). */
  def redactionCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailPattern)),
    "n_urls" -> regexp_count(text, lit(UrlPattern)),
    "n_tags" -> regexp_count(text, lit(TagPattern)))

  /** [[redactionCounts]] extended with the PII patterns. Counts run on the
    * RAW text (same discipline as redactionCounts): an IP inside a URL
    * counts as an IP here even though [[scrubPii]] redacts it as part of
    * the URL. */
  def piiCounts(text: Column): Seq[(String, Column)] =
    redactionCounts(text) ++ Seq(
      "n_ips" -> regexp_count(text, lit(Ipv4Pattern)),
      "n_phones" -> regexp_count(text, lit(PhonePattern)))

  /** Targets of the mojibake repair pass: the high-frequency punctuation
    * (curly quotes, dashes, ellipsis) and Latin-1 letters whose UTF-8
    * bytes, mis-decoded as Windows-1252, produce the classic multi-char
    * artifacts scraped corpora are full of. */
  val MojibakeTargets: Seq[String] = Seq(
    "’", "‘", "“", "”", "–", "—", "…",
    "é", "è", "ê", "ë", "á", "à", "â",
    "ä", "ó", "ò", "ô", "ö", "ú", "ù",
    "û", "ü", "í", "ì", "î", "ï", "ñ",
    "ç", "ß", " ")

  /** Mis-decode a (correct) string the way the bug does: its UTF-8 bytes
    * read back as Windows-1252 ("café" → "cafÃ©"). Exposed
    * so fixtures and gates corrupt inputs with the EXACT corruption the
    * repair inverts. */
  def asMojibake(good: String): String =
    new String(good.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))

  /** The repair table (ftfy's core case, arXiv:1905.01803 §2): each entry
    * is GENERATED as the exact mis-decoding of one target code point, so a
    * repair is precisely the inverse of the corruption. (Text that
    * LEGITIMATELY contains an artifact sequence — e.g. prose about
    * mojibake — is rewritten too; that is the standard ftfy trade, and the
    * sequences are vanishingly rare as intentional content.) Ordered
    * longest-artifact-first (then lexicographic — fully deterministic), so
    * a three-char punctuation artifact is repaired before any shorter
    * artifact that might be a prefix of it. */
  val MojibakeTable: Seq[(String, String)] =
    MojibakeTargets.map(good => asMojibake(good) -> good)
      .sortBy { case (bad, _) => (-bad.length, bad) }

  /** Repair double-encoded UTF-8 (mojibake): one literal `replace` per
    * table entry, applied in table order (left-to-right non-overlapping —
    * the same semantics in every engine). A fixed-size codegen'd
    * projection; no regex engine involved. */
  def fixMojibake(text: Column): Column =
    MojibakeTable.foldLeft(text) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }

  /** Corpus-level duplicated-line removal (the CCNet/Gopher line-dedup
    * pass): a line appearing in more than `maxDocFrequency` DISTINCT
    * documents is boilerplate (headers, navigation, license banners) and is
    * stripped from EVERY document, including the first; surviving lines are
    * reassembled in their original order.
    *
    * Scale shape: three exchanges, all narrow —
    *  1. line document-frequency: distinct (doc, line-hash) then a count
    *     keyed by the 64-bit line hash (never the line text);
    *  2. the postings ⋈ hot-line-set anti join, keyed by the same hash
    *     (the hot set is small — boilerplate by definition — but is NOT
    *     assumed broadcastable);
    *  3. reassembly keyed by doc id, ordered by original line position
    *     through an unbounded window frame (the contract-backed ordered
    *     collect — groupBy.collect_list has no ordering guarantee under
    *     aggregation fallback).
    * Intra-document repeats of a rare line survive — document frequency
    * counts documents, not occurrences (reference CCNet discipline).
    *
    * Output: (idCol, textCol deduped, n_lines, n_removed). Documents whose
    * every line was boilerplate remain with empty text — dropping them is a
    * quality-filter decision, not a dedup decision. */
  def dedupLines(docs: DataFrame, maxDocFrequency: Long,
                 idCol: String = "doc_id", textCol: String = "text",
                 sep: String = "\n"): DataFrame = {
    val lines = docs
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .select(col("__id"), col("pos").as("__pos"), col("col").as("__line"),
        xxhash64(col("col")).as("__lh"))
    val hot = lines.select(col("__id"), col("__lh")).distinct()
      .groupBy("__lh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDocFrequency)
      .select("__lh")
    val kept = lines.join(hot, Seq("__lh"), "left_anti")
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rebuilt = kept
      .select(col("__id"), collect_list(col("__line")).over(w).as("__arr"),
        count(lit(1)).over(w).as("n_kept"))
      .groupBy("__id")
      .agg(first(col("__arr")).as("__arr"), first(col("n_kept")).as("n_kept"))
      .select(col("__id"), concat_ws(sep, col("__arr")).as(textCol),
        col("n_kept"))
    // docs with every line removed fall out of `kept` — restore them empty
    val totals = docs.select(col(idCol).as("__id"),
      size(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .cast("long").as("n_lines"))
    totals.join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col(textCol), lit("")).as(textCol),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** PER-DOMAIN boilerplate removal (the RefinedWeb / C4 site-template
    * rule): a line is boilerplate for a domain when it appears in MORE THAN
    * `maxDocShare` of that domain's documents — navigation bars, cookie
    * banners, footers stamped onto every page of a site — and is stripped
    * from that domain's documents only. The same line on a domain where it
    * is rare survives, which is exactly what the GLOBAL document-frequency
    * rule ([[dedupLines]]) cannot express: a corpus-wide cap either misses
    * per-site templates (threshold too high) or scrubs legitimately common
    * sentences everywhere (too low). Domains with fewer than
    * `minDomainDocs` documents are exempt — a share threshold over three
    * pages is noise, not evidence of a template.
    *
    * Scale shape: everything keys on (domain, 64-bit line hash) — the
    * line-share aggregation, the hot-set anti join — so one shuffle family
    * co-locates the whole decision and the line TEXT never shuffles except
    * inside its own document's reassembly. Per-domain doc counts are a
    * domain-sized frame joined onto the domain-keyed DF aggregation (AQE
    * broadcasts it when small; the plan never assumes it is). Reassembly is
    * the same contract-backed ordered collect as [[dedupLines]].
    *
    * Output: (idCol, domainCol, textCol scrubbed, n_lines, n_removed). */
  def scrubBoilerplate(docs: DataFrame, maxDocShare: Double,
                       minDomainDocs: Long = 5,
                       idCol: String = "doc_id", domainCol: String = "source",
                       textCol: String = "text",
                       sep: String = "\n"): DataFrame = {
    val lines = docs
      .select(col(idCol).as("__id"), col(domainCol).as("__dom"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .select(col("__id"), col("__dom"), col("pos").as("__pos"),
        col("col").as("__line"), xxhash64(col("col")).as("__lh"))
    val hot = boilerplateTemplates(docs, maxDocShare, minDomainDocs,
      idCol, domainCol, textCol, sep)
      .select(col(domainCol).as("__dom"), col("line_hash").as("__lh"))
    val kept = lines.join(hot, Seq("__dom", "__lh"), "left_anti")
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rebuilt = kept
      .select(col("__id"), collect_list(col("__line")).over(w).as("__arr"),
        count(lit(1)).over(w).as("n_kept"))
      .groupBy("__id")
      .agg(first(col("__arr")).as("__arr"), first(col("n_kept")).as("n_kept"))
      .select(col("__id"), concat_ws(sep, col("__arr")).as(textCol),
        col("n_kept"))
    val totals = docs.select(col(idCol).as("__id"), col(domainCol),
      size(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .cast("long").as("n_lines"))
    totals.join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol), col(domainCol),
        coalesce(col(textCol), lit("")).as(textCol),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** The FIT half of [[scrubBoilerplate]]: each domain's template lines as
    * a persistable (domainCol, line_hash) frame — the hot set the scrub
    * anti-joins. Batch-fit this on a corpus snapshot, then strip an ingest
    * stream with [[scrubBoilerplateStateless]]. */
  def boilerplateTemplates(docs: DataFrame, maxDocShare: Double,
                           minDomainDocs: Long = 5,
                           idCol: String = "doc_id",
                           domainCol: String = "source",
                           textCol: String = "text",
                           sep: String = "\n"): DataFrame = {
    val lines = docs
      .select(col(idCol).as("__id"), col(domainCol).as("__dom"),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as("__line"))
      .select(col("__id"), col("__dom"), xxhash64(col("__line")).as("__lh"))
    val domSizes = docs.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__nd"))
    lines.distinct()
      .groupBy(col("__dom"), col("__lh")).agg(count(lit(1)).as("__df"))
      .join(domSizes, Seq("__dom"))
      .filter(col("__nd") >= minDomainDocs &&
        col("__df").cast("double") > col("__nd").cast("double") * maxDocShare)
      .select(col("__dom").as(domainCol), col("__lh").as("line_hash"))
  }

  /** Stateless scrub twin of [[scrubBoilerplate]]: the batch-fitted
    * [[boilerplateTemplates]] pack into ONE broadcast row (domain → line
    * hashes), and each document is cleaned by an in-row filter over its
    * own split lines — no explode, no anti-join shuffle, no reassembly
    * aggregation — so it runs UNCHANGED on a streaming frame (append
    * mode), the [[Dsir.scoreStateless]] discipline. Identical output to
    * the batch scrub over the corpus the templates were fitted from
    * (spec-enforced); on fresh stream content the templates are the
    * frozen fit, the production arrangement (site templates come from a
    * crawl snapshot, not from the page being ingested). */
  def scrubBoilerplateStateless(docs: DataFrame, templates: DataFrame,
                                idCol: String = "doc_id",
                                domainCol: String = "source",
                                textCol: String = "text",
                                sep: String = "\n"): DataFrame = {
    val packed = broadcast(templates
      .groupBy(col(domainCol))
      .agg(collect_list(col("line_hash")).as("__hs"))
      .groupBy()
      .agg(map_from_entries(collect_list(
        struct(col(domainCol), col("__hs")))).as("__tm"))
      .withColumn("__k", lit(1)))
    docs
      .withColumn("__k", lit(1))
      .join(packed, Seq("__k"))
      .withColumn("__lines",
        split(col(textCol), java.util.regex.Pattern.quote(sep)))
      .withColumn("__hot",
        coalesce(element_at(col("__tm"), col(domainCol)),
          array().cast("array<bigint>")))
      .withColumn("__kept",
        filter(col("__lines"), l => !array_contains(col("__hot"), xxhash64(l))))
      // carry-through: every input column survives (textCol replaced by
      // the scrubbed text) so the twin chains inside a composed stream
      .select(docs.columns.toSeq.map {
        case n if n == textCol => concat_ws(sep, col("__kept")).as(textCol)
        case n                 => col(s"`$n`")
      } ++ Seq(
        size(col("__lines")).cast("long").as("n_lines"),
        (size(col("__lines")) - size(col("__kept"))).cast("long")
          .as("n_removed")): _*)
  }
}
