package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL operators — the pass every crawl-derived training set
  * runs BEFORE text-level dedup: C4 (Raffel et al. 2020) dedups pages by
  * URL, CCNet/RefinedWeb normalize URLs then dedup and cap pages per
  * registered domain, and Dolma filters against domain blocklists.
  *
  * chewdata has no URL stage (closest surface: the string updater family,
  * reference src/updater/tera.rs); this extends the training-data surface
  * the same way the dedup/curation operators do.
  *
  * Scale shape: the normalizer is a pure projection built from codegen'd
  * string functions (no UDF, no custom expression), so it fuses into the
  * scan stage; URL dedup is ONE hash shuffle carrying (key, id) pairs —
  * the corpus text never moves; the blocklist compiles to a scan-stage
  * OR chain (policy lists are small, no join); the per-domain cap rides
  * the bounded min-k heap (≤ k entries per aggregation buffer, partial
  * map-side — no per-domain window over the corpus).
  */
object Web {

  /** Query params that never change page identity: analytics/tracking
    * keys stripped by [[urlKey]]. Anchored prefix match per `k=v` part. */
  val trackingParamPattern: String = "^(utm_[^=]*|fbclid|gclid|ref)(=|$)"

  private def schemeStripped(url: Column): Column =
    regexp_replace(substring_index(lower(trim(url)), "#", 1),
      "^[a-z][a-z0-9+.-]*://", "")

  private def hostOf(noScheme: Column): Column = {
    val base = substring_index(noScheme, "?", 1)
    regexp_replace(
      regexp_replace(substring_index(base, "/", 1), "^www\\.", ""),
      ":(80|443)$", "")
  }

  /** Canonical dedup key for a URL: lowercased; fragment dropped; scheme
    * dropped; leading `www.` and default `:80`/`:443` ports stripped;
    * tracking params removed ([[trackingParamPattern]]); surviving query
    * params sorted (binary order); trailing slashes stripped from the
    * path. `https://WWW.Ex.com:443/a/?utm_source=x&b=2&a=1#top` →
    * `ex.com/a?a=1&b=2`. Null-total (null → null).
    *
    * The param filter is an interpreted HOF lambda — fine here because a
    * query string holds a handful of parts, unlike the per-token hot
    * loops that forced native expressions elsewhere (SURVEY §8 lesson).
    */
  def urlKey(url: Column): Column = {
    val noScheme = schemeStripped(url)
    val base = substring_index(noScheme, "?", 1)
    val qs = regexp_extract(noScheme, "\\?(.*)$", 1)
    val path = regexp_replace(regexp_extract(base, "^[^/]*(/.*)$", 1), "/+$", "")
    val params = array_sort(filter(split(qs, "&"),
      p => p =!= lit("") && !p.rlike(trackingParamPattern)))
    val qn = array_join(params, "&")
    concat(hostOf(noScheme), path,
      when(length(qn) > 0, concat(lit("?"), qn)).otherwise(lit("")))
  }

  /** Normalized hostname of a URL (lowercased, `www.`/default-port
    * stripped). Subdomains are kept — suffix policy belongs to the
    * caller (see [[dropBlockedDomains]]). */
  def urlHost(url: Column): Column = hostOf(schemeStripped(url))

  /** URL duplicate groups: one row per canonical URL with the min-id
    * keeper and the group size. One two-phase groupBy on the key. */
  def urlDupGroups(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(urlKey(col(urlCol)).as("url_key"), col(idCol))
      .groupBy(col("url_key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** Keep the min-id row per canonical URL (the C4 URL-dedup pass). */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val keep = df.select(urlKey(col(urlCol)).as("__uk"), col(idCol))
      .groupBy(col("__uk")).agg(min(col(idCol)).as(idCol))
      .drop("__uk")
    df.join(keep, Seq(idCol), "leftsemi")
  }

  /** Drop rows whose URL host is a blocked domain or any subdomain of
    * one (`ads.example.com` is blocked by `example.com`;
    * `notexample.com` is not). The blocklist is driver-side by design —
    * policy lists are thousands of entries, not data-sized — and
    * compiles to a codegen'd OR chain evaluated in the scan stage: no
    * join, no shuffle. Null/unparseable URLs are kept (filtering them
    * is a validator's job, not a blocklist's). */
  def dropBlockedDomains(df: DataFrame, urlCol: String,
                         blocked: Seq[String]): DataFrame =
    if (blocked.isEmpty) df
    else {
      val h = urlHost(col(urlCol))
      val hit = blocked.map(_.toLowerCase)
        .map(b => h === lit(b) || h.endsWith(lit("." + b)))
        .reduce(_ || _)
      df.filter(!coalesce(hit, lit(false)))
    }

  /** Cap pages per host (RefinedWeb keeps at most N pages per domain so
    * no single site dominates the corpus): deterministic uniform
    * k-per-host — keep the k rows with the smallest portable content
    * hash within each host, via the bounded MinKByKey heap (≤ k 16-byte
    * entries per aggregation buffer, map-side partials; the shuffle
    * carries k pairs per host × partition, never the corpus; identical
    * under reruns and repartitioning). */
  def capPerHost(df: DataFrame, idCol: String, urlCol: String,
                 k: Int): DataFrame = {
    val host = urlHost(col(urlCol))
    val h = conv(substring(md5(
      concat(host, lit("-"), col(idCol)).cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val keep = df
      .select(host.as("__host"), col(idCol).cast("long").as("__id"), h.as("__h"))
      .groupBy(col("__host"))
      .agg(graft.plans.Native.minKByKey(col("__h"), col("__id"), k).as("ks"))
      .select(explode(transform(col("ks"), e => e.getField("p"))).as("__keep"))
    df.join(keep, col(idCol).cast("long") === col("__keep"), "leftsemi")
  }

  /** HTML → plain text (the C4/CCNet upstream extraction pass — every
    * crawl-derived corpus starts from markup, not prose; Raffel et al.
    * 2020 §2.1 describe exactly this strip-and-normalize step). A fixed
    * regex/replace chain over codegen'd built-ins, so extraction fuses
    * into the scan stage: zero shuffle, one pass per page.
    *
    * Chain (every pattern valid and identical under Java regex AND RE2,
    * so a DuckDB oracle replays it bit-exactly — note no backreferences,
    * which RE2 lacks; script/style/title each get their own replace):
    * drop script/style/title blocks and comments; block-level closers
    * and br/hr become newlines; remaining tags drop; the six standard
    * entities decode (&amp; last, so `&amp;lt;` can't double-decode);
    * horizontal whitespace collapses to one space, newline runs to one
    * newline, and the edges trim. Null-total (null → null). */
  def htmlToText(html: Column): Column = {
    val noBlocks = Seq("script", "style", "title").foldLeft(html)((c, t) =>
      regexp_replace(c, s"(?is)<$t\\b[^>]*>.*?</$t\\s*>", ""))
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", "")
    val blocksToNl = regexp_replace(
      regexp_replace(noComments,
        "(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|blockquote)\\s*>", "\n"),
      "(?i)<(br|hr)\\s*/?\\s*>", "\n")
    val noTags = regexp_replace(blocksToNl, "<[^>]*>", "")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    val oneSpace = regexp_replace(decoded, "[ \\t\\r\\f]+", " ")
    val oneNl = regexp_replace(
      regexp_replace(oneSpace, " ?\\n ?", "\n"), "\\n+", "\n")
    regexp_replace(oneNl, "^[ \\n]+|[ \\n]+$", "")
  }

  /** All href targets of a page, in document order (feeds [[urlKey]] /
    * [[dedupByUrl]] for link-graph work). Double-quoted hrefs only —
    * the deterministic common case; a parser is out of scope by design. */
  def htmlLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1))

  /** Markdown → plain text (the [[htmlToText]] sibling for the other big
    * crawl-adjacent format: READMEs, forums, issue trackers, docs sites).
    * Same contract: a fixed regex/replace chain over codegen'd built-ins
    * (scan-stage, zero shuffle), every pattern valid and IDENTICAL under
    * Java regex and RE2 — no backreferences in patterns; `$1`-style group
    * substitutions in replacements only, which both engines support — so
    * a DuckDB oracle replays the chain bit-exactly.
    *
    * Chain, in rule-dependency order: fenced code blocks drop whole
    * (their content is code, not prose — the CCNet/RedPajama policy);
    * inline code keeps its content; images and inline/reference links
    * keep the alt/anchor text; ATX headers, horizontal rules, blockquote
    * markers and list bullets strip at line starts (hr BEFORE emphasis,
    * while its `***`/`---` lines still exist); emphasis/strike markers
    * strip everywhere (documented naive case: a snake_case underscore is
    * also stripped — markers are not word-boundary-checked); then the
    * same whitespace normalization tail as [[htmlToText]]. Null-total. */
  def markdownToText(md: Column): Column = {
    val noFence = regexp_replace(md, "(?s)```.*?```", "\n")
    val noInlineCode = regexp_replace(noFence, "`([^`\\n]*)`", "$1")
    val noImages = regexp_replace(noInlineCode, "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noLinks = regexp_replace(noImages, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noRefLinks = regexp_replace(noLinks, "\\[([^\\]]*)\\]\\[[^\\]]*\\]", "$1")
    val noHeaders = regexp_replace(noRefLinks, "(?m)^[ \\t]{0,3}#{1,6}[ \\t]*", "")
    val noHr = regexp_replace(noHeaders, "(?m)^[ \\t]*([-*_][ \\t]*){3,}$", "")
    val noQuote = regexp_replace(noHr, "(?m)^[ \\t]*>[ \\t]?", "")
    val noBullets = regexp_replace(noQuote, "(?m)^[ \\t]*([-*+]|[0-9]+\\.)[ \\t]+", "")
    val noEmph = regexp_replace(noBullets, "\\*{1,3}|_{1,3}|~~", "")
    val oneSpace = regexp_replace(noEmph, "[ \\t\\r\\f]+", " ")
    val oneNl = regexp_replace(
      regexp_replace(oneSpace, " ?\\n ?", "\n"), "\\n+", "\n")
    regexp_replace(oneNl, "^[ \\n]+|[ \\n]+$", "")
  }

  /** All inline-link targets of a markdown document, in order (the
    * [[htmlLinks]] sibling; feeds the URL pass). */
  def markdownLinks(md: Column): Column =
    regexp_extract_all(md, lit("\\[[^\\]]*\\]\\(([^)]*)\\)"), lit(1))
}
