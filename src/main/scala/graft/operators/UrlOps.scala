package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction — the grouping keys of every
  * web-corpus pipeline stage that reasons per-site: per-domain quotas
  * ([[Sampling.groupCap]]), domain-level quality priors, URL-keyed exact
  * dedup (the first dedup tier of CommonCrawl-derived corpora, where the
  * same page is fetched under utm-decorated variants).
  *
  * Everything is a pure projection over portable regex + array ops —
  * codegen'd, engine-checkable, no shuffle. Parsing is regex-based (NOT
  * `parse_url`, which other engines lack and whose Spark implementation
  * is not codegen'd).
  *
  * Canonicalization rules (the de-facto crawl-dedup set):
  *  - scheme and host lowercase; userinfo dropped;
  *  - default ports stripped (`:80` for http, `:443` for https);
  *  - fragment dropped;
  *  - tracking parameters dropped (utm_*, fbclid, gclid, msclkid, ref,
  *    mc_eid, mc_cid);
  *  - surviving query parameters SORTED (byte order) — parameter order is
  *    transport noise;
  *  - empty path becomes "/".
  */
object UrlOps {

  /** scheme://[userinfo@]hostport path [?query] [#fragment] */
  private val P = "^([A-Za-z][A-Za-z0-9+.-]*)://(?:[^/?#@]*@)?([^/?#]*)([^?#]*)\\??([^#]*)#?(.*)$"

  /** True when the value is URL-shaped (scheme://...). Non-URL input fed
    * to the extractors yields empty strings and [[canonicalize]] collapses
    * it to the degenerate `"://" + "/"` shell — deterministic but
    * meaningless, so crawl frames filter on this first. */
  def isUrl(value: Column): Column =
    value.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")

  /** Query-parameter names that identify campaigns/clicks, not content. */
  val TrackingParams = "^(utm_[^=]*|fbclid|gclid|msclkid|ref|mc_eid|mc_cid)(=.*)?$"

  /** Second-level public suffixes where the registered domain needs three
    * labels (a pragmatic shortlist, not the full PSL — the full list is a
    * data file, not logic; swap in a broadcast lookup to extend). */
  val SecondLevelTlds: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au", "co.jp",
    "co.nz", "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.sg",
    "com.tr", "com.ar")

  def scheme(url: Column): Column = lower(regexp_extract(url, P, 1))

  /** Lowercased host with any port removed. */
  def host(url: Column): Column =
    lower(regexp_extract(regexp_extract(url, P, 2), "^([^:]*)", 1))

  /** Port as a string, empty when absent. */
  def port(url: Column): Column =
    regexp_extract(regexp_extract(url, P, 2), ":([0-9]+)$", 1)

  def path(url: Column): Column = regexp_extract(url, P, 3)

  def query(url: Column): Column = regexp_extract(url, P, 4)

  /** Registered domain: last two host labels, or three when the last two
    * form a known second-level public suffix (`bbc.co.uk` → `bbc.co.uk`,
    * `www.example.com` → `example.com`). */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", slice(labels, greatest(n - 1, lit(1)), lit(2)))
    val isSecondLevel = SecondLevelTlds
      .map(t => lastTwo === lit(t)).reduce(_ || _)
    when(n <= 2, hostCol)
      .when(isSecondLevel, concat_ws(".", slice(labels, n - 2, lit(3))))
      .otherwise(lastTwo)
  }

  /** Canonical query string: tracking params dropped, survivors sorted. */
  private def canonicalQuery(q: Column): Column =
    array_join(array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.rlike(TrackingParams))), "&")

  /** The canonical URL (see object doc for the rule set). */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val h = host(url)
    val p = port(url)
    val keepPort = p =!= "" &&
      !(sch === "http" && p === "80") && !(sch === "https" && p === "443")
    val pathOrRoot = when(path(url) === "", "/").otherwise(path(url))
    val q = canonicalQuery(query(url))
    concat(sch, lit("://"), h,
      when(keepPort, concat(lit(":"), p)).otherwise(lit("")),
      pathOrRoot,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** URL blocklist categorization (L115) — the FIRST filter of the
    * RefinedWeb/FineWeb-style web-curation recipe: a small curated
    * blocklist (UT1-shaped: adult/gambling/ads/... categories keyed by
    * domain, host suffix, or path keyword) tags every crawled URL before
    * any content-level work runs.
    *
    * `rules` are ordered (category, kind, pattern) triples — FIRST match
    * wins, the provenance discipline [[Curation.filterWithProvenance]]
    * set. Kinds:
    *  - `domain`: [[registeredDomain]] equals the pattern;
    *  - `host_suffix`: [[host]] equals the pattern or ends with
    *    `"." + pattern` (label-boundary-safe — `evil.com` does not match
    *    `notevil.com`);
    *  - `path_kw`: [[path]] contains the pattern (case-sensitive; the
    *    path's case is content, unlike the host's).
    * Host-side patterns must be lowercase ([[host]] lowercases).
    *
    * Scale shape: a PURE in-row projection — the rule list compiles to
    * one coalesce of when-chains (a real blocklist is thousands of
    * entries: swap the literal fold for a broadcast join on domain +
    * the suffix/path tails, same output contract). The corpus never
    * shuffles and the whole filter rides whole-stage codegen.
    *
    * Output: input + (host, domain, category, blocked); category is the
    * first matching rule's, null when unblocked. */
  def categorize(urls: DataFrame, urlCol: String,
                 rules: Seq[(String, String, String)]): DataFrame = {
    require(rules.nonEmpty, "categorize: empty rule list")
    val kinds = Set("domain", "host_suffix", "path_kw")
    require(rules.forall(r => kinds(r._2)),
      s"rule kinds must be in $kinds: ${rules.filterNot(r => kinds(r._2))}")
    val reserved = Seq("host", "domain", "category", "blocked", "__path")
    require(!urls.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by categorize")
    val u = col(urlCol)
    val withParts = urls
      .withColumn("host", host(u))
      .withColumn("domain", registeredDomain(col("host")))
      .withColumn("__path", path(u))
    def matches(kind: String, pat: String): Column = kind match {
      case "domain"      => col("domain") === pat
      case "host_suffix" => col("host") === pat ||
        col("host").endsWith("." + pat)
      case "path_kw"     => col("__path").contains(pat)
    }
    val category = coalesce(rules.map { case (c, k, p) =>
      when(matches(k, p), lit(c)) } :+ lit(null).cast("string"): _*)
    withParts
      .withColumn("category", category)
      .withColumn("blocked", col("category").isNotNull)
      .drop("__path")
  }

  /** The broadcast-join twin of [[categorize]] — the 100 TB contract for
    * a PRODUCTION-sized blocklist (UT1's adult list alone is ~4M
    * domains: a when-chain of millions of literals is not a plan; a
    * broadcast table is). Same rule kinds, same first-match-wins
    * semantics, same output contract — the equivalence is spec-pinned
    * against [[categorize]] on the same rules.
    *
    * `rules` is a DataFrame (category, kind, pattern, rule_pos) with
    * rule_pos the 0-based position in the ordered list (DataFrames are
    * unordered; position must travel as data). First match = the
    * matching rule with the SMALLEST rule_pos.
    *
    * Join strategy per kind — the reason this scales:
    *  - `domain`: broadcast EQUI-join on [[registeredDomain]];
    *  - `host_suffix`: the host explodes into its label suffixes
    *    (`a.b.c.com` → 4 rows via substring_index — codegen'd, bounded
    *    by label count), turning "endsWith at a label boundary" into a
    *    broadcast EQUI-join on the suffix;
    *  - `path_kw`: broadcast theta-join on `contains` — a nested-loop
    *    over ONLY the path_kw subset, which in UT1-shaped lists is
    *    dozens of keywords against millions of domains: keep keyword
    *    rules few, that leg is per-row × |keywords|.
    * Matches union (hit-sized: most URLs are clean), one min-struct
    * aggregation picks the winning rule per URL, and ONE left equi-join
    * hands verdicts back to the corpus — the corpus itself never
    * explodes and never carries rule text.
    *
    * `idCol` must be a unique row key (the join-back identity; the
    * family contract shared with [[graft.operators.Sampling.bernoulli]]). */
  def categorizeBroadcast(urls: DataFrame, urlCol: String, idCol: String,
                          rules: DataFrame): DataFrame = {
    val reserved = Seq("host", "domain", "category", "blocked", "__path",
      "__sfx", "__pos", "__m")
    require(!urls.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by categorizeBroadcast")
    // fail fast on an empty or mistyped rule table, like the literal-fold
    // twin — a silently-dropped kind would turn the blocklist off with no
    // error. The kinds check is an EAGER model-sized Spark action at
    // plan-build time (it re-executes the rules lineage): the contract is
    // that rules frames are blocklist-sized and cheap — localCheckpoint
    // the rules upstream if their lineage is expensive to recompute
    val kinds = Set("domain", "host_suffix", "path_kw")
    val seenKinds = rules.select(col("kind")).distinct()
      .collect().map(_.getString(0))
    require(seenKinds.nonEmpty, "categorizeBroadcast: empty rule table")
    require(seenKinds.forall(kinds),
      s"rule kinds must be in $kinds: ${seenKinds.filterNot(kinds).toSeq}")
    val u = col(urlCol)
    val withParts = urls
      .withColumn("host", host(u))
      .withColumn("domain", registeredDomain(col("host")))
      .withColumn("__path", path(u))
    // narrow key frame feeds the three match legs; the full row set is
    // joined only once, at the end
    val parts = withParts
      .select(col(idCol), col("host"), col("domain"), col("__path"))
    def leg(kind: String) = broadcast(
      rules.filter(col("kind") === kind)
        .select(col("category").as("__c"), col("pattern"),
          col("rule_pos").cast("long").as("__pos")))
    val dHits = parts
      .join(leg("domain"), col("domain") === col("pattern"))
    // substring_index(host, '.', -(n+1)) = the host's last n+1 labels —
    // the full label-suffix set, one codegen'd projection per label
    val sMatched = parts
      .select(col(idCol), col("host"),
        posexplode(split(col("host"), "\\.")).as(Seq("__n", "__lbl")))
      .select(col(idCol),
        expr("substring_index(host, '.', -(__n + 1))").as("__sfx"))
      .join(leg("host_suffix"), col("__sfx") === col("pattern"))
    val pHits = parts
      .join(leg("path_kw"), col("__path").contains(col("pattern")))
    val matches = dHits.select(col(idCol), col("__pos"), col("__c"))
      .unionByName(sMatched.select(col(idCol), col("__pos"), col("__c")))
      .unionByName(pHits.select(col(idCol), col("__pos"), col("__c")))
    val verdict = matches
      .groupBy(col(idCol))
      .agg(min(struct(col("__pos"), col("__c"))).as("__m"))
      .select(col(idCol), col("__m.__c").as("category"))
    withParts
      .join(verdict, Seq(idCol), "left")
      .withColumn("blocked", col("category").isNotNull)
      .drop("__path")
  }

  /** Stateless streaming twin of [[categorizeBroadcast]]: the rule
    * TABLE (same (category, kind, pattern, rule_pos) contract) is
    * folded into ONE pos-sorted array row and broadcast-crossed onto
    * the stream; the verdict is a pure in-row scan of that array —
    * first match = first element of the filtered, pos-ordered rules.
    * No aggregation, no stream-side shuffle, so it runs append-mode on
    * an unbounded ingest exactly like the literal-fold [[categorize]]
    * — but keeps the TABLE-shaped rule contract (rules stay data, hot-
    * swappable by refitting the static side, never recompiled plans).
    *
    * Memory contract: the whole rule table rides one broadcast row —
    * the same footprint [[categorizeBroadcast]]'s broadcast legs pay,
    * but per-URL work is O(|rules|) instead of the batch twin's
    * hash-join probes: on a BATCH corpus with a UT1-sized list, use
    * [[categorizeBroadcast]]; on a stream (no groupBy available in
    * append mode without a watermark), this is the arrangement. */
  def categorizeBroadcastStateless(urls: DataFrame, urlCol: String,
                                   rules: DataFrame): DataFrame = {
    val reserved = Seq("host", "domain", "category", "blocked", "__path",
      "__rules")
    require(!urls.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by categorizeBroadcastStateless")
    // kinds check runs on the STATIC rule side at plan-build time (one
    // model-sized job; rules frames are blocklist-sized by contract —
    // checkpoint upstream if the rules lineage is expensive)
    val kinds = Set("domain", "host_suffix", "path_kw")
    val seenKinds = rules.select(col("kind")).distinct()
      .collect().map(_.getString(0))
    require(seenKinds.nonEmpty, "categorizeBroadcastStateless: empty rule table")
    require(seenKinds.forall(kinds),
      s"rule kinds must be in $kinds: ${seenKinds.filterNot(kinds).toSeq}")
    val ruleRow = rules.agg(sort_array(collect_list(struct(
      col("rule_pos").cast("long").as("pos"), col("category"),
      col("kind"), col("pattern")))).as("__rules"))
    val u = col(urlCol)
    def ruleMatches(r: Column): Column =
      (r.getField("kind") === "domain" &&
        col("domain") === r.getField("pattern")) ||
      (r.getField("kind") === "host_suffix" &&
        (col("host") === r.getField("pattern") ||
          col("host").endsWith(concat(lit("."), r.getField("pattern"))))) ||
      (r.getField("kind") === "path_kw" &&
        col("__path").contains(r.getField("pattern")))
    urls
      .withColumn("host", host(u))
      .withColumn("domain", registeredDomain(col("host")))
      .withColumn("__path", path(u))
      .crossJoin(broadcast(ruleRow))
      // get() is 0-based and null on empty — no-match URLs stay unblocked
      .withColumn("category",
        get(filter(col("__rules"), ruleMatches(_)), lit(0))
          .getField("category"))
      .withColumn("blocked", col("category").isNotNull)
      .drop("__path", "__rules")
  }

  /** URL-parallel bitext document alignment (L136) — the ParaCrawl/WMT
    * baseline aligner (Bañón et al. 2020 §3: URL matching recovers a
    * large share of parallel pages before any content model runs): two
    * pages whose URLs differ ONLY by a language marker are translation
    * candidates. Marker kinds, in priority order (first match wins, only
    * the matched component is stripped from the site key):
    *  - leading HOST label (`en.example.com`);
    *  - first PATH segment (`/en/art/7`);
    *  - a `lang`/`locale`/`hl` QUERY parameter (`?lang=en`).
    * Lang-ish query params are stripped from the site key UNCONDITIONALLY
    * (they are language markers by definition); all other query params
    * stay, so `/art?id=1` never pairs with `/art?id=2`. (Known edge: the
    * key cleanup matches param names by SUBSTRING — `xlang=en` also
    * loses its value tail — but identically on both sides of any
    * candidate pair, so pairing semantics are unaffected; marker
    * EXTRACTION is anchored and never misfires.) A URL carrying
    * TWO markers (lang host label AND lang path segment) strips only the
    * host one — such variants differ by more than one marker and
    * correctly don't pair.
    *
    * Rows with no marker are dropped (unmarked pages don't participate in
    * URL alignment); site keys with more than `maxPerKey` marked pages are
    * dropped whole (hot-key guard — link farms would otherwise go
    * quadratic; the count is OUTPUT-sized, one key-keyed aggregation).
    *
    * Scale shape: marker extraction + key stripping is a pure codegen'd
    * projection; pairing is ONE equi-join on the site key bounded by
    * maxPerKey² per key. Output: (site_key, doc_a, lang_a, doc_b,
    * lang_b) with lang_a < lang_b — each cross-language page pair once.
    */
  def parallelUrlPairs(docs: DataFrame, urlCol: String, idCol: String,
                       langs: Seq[String],
                       maxPerKey: Int = 64): DataFrame = {
    require(langs.nonEmpty, "parallelUrlPairs: empty language set")
    require(maxPerKey >= 2, s"maxPerKey=$maxPerKey: need >= 2")
    val langSet = langs.map(_.toLowerCase)
    val u = col(urlCol)
    val h = host(u)
    val p = path(u)
    val q = query(u)
    val hostLabel = regexp_extract(h, "^([^.]+)\\.", 1)
    val seg1 = lower(regexp_extract(p, "^/([^/]+)", 1))
    val qLang = lower(regexp_extract(q, "(?:^|&)(?:lang|locale|hl)=([^&]*)", 1))
    val isHost = hostLabel.isin(langSet: _*)
    val isPath = seg1.isin(langSet: _*)
    val isQ = qLang.isin(langSet: _*)
    val mark = when(isHost, hostLabel).when(isPath, seg1)
      .when(isQ, qLang)
    val h1 = when(isHost, regexp_replace(h, "^[^.]+\\.", "")).otherwise(h)
    val p1 = when(!isHost && isPath, regexp_replace(p, "^/[^/]+", ""))
      .otherwise(p)
    // lang-ish params out, separator runs collapsed, edges trimmed
    val q1 = regexp_replace(regexp_replace(
      regexp_replace(q, "(?:lang|locale|hl)=[^&]*", ""),
      "&&+", "&"), "^&|&$", "")
    val key = concat(h1, p1,
      when(q1 =!= "", concat(lit("?"), q1)).otherwise(lit("")))
    val tagged = docs
      .select(col(idCol).as("__id"), key.as("site_key"), mark.as("__lang"))
      .filter(col("__lang").isNotNull)
    val okKeys = tagged.groupBy(col("site_key"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxPerKey).drop("__n")
    val ok = tagged.join(okKeys, Seq("site_key"))
    val a = ok.select(col("site_key"), col("__id").as("doc_a"),
      col("__lang").as("lang_a"))
    val b = ok.select(col("site_key"), col("__id").as("doc_b"),
      col("__lang").as("lang_b"))
    a.join(b, Seq("site_key")).filter(col("lang_a") < col("lang_b"))
      .select(col("site_key"), col("doc_a"), col("lang_a"),
        col("doc_b"), col("lang_b"))
  }
}
