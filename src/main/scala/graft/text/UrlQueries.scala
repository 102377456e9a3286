package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** URL/domain curation — RefinedWeb-class pipelines dedup, weight and
  * filter at URL granularity before anything touches document text:
  * parse each URL into components, roll corpus mass up to the registered
  * domain (the domain-mixture input), and drop blocklisted domains with
  * an auditable count. Reference scope: no analog in the reference
  * engine; part of the LLM-pipeline extension mandated alongside
  * SURVEY.md §2.
  *
  * Parsing is ONE anchored regex (RFC-3986's pattern family restricted
  * to what both Java regex and RE2 share — no backreferences, no
  * lookaround), engine-portable and exactly oracle-checkable. A
  * non-matching optional group yields the empty string in BOTH engines
  * (verified; NULL-free output keeps the fingerprint simple). The
  * registered domain is the last two host labels, widened to three for a
  * curated multi-part-suffix set (`co.uk`-class) — a deterministic
  * approximation of the public-suffix list, which is a 10k-line data
  * file, not an algorithm; the approximation is the industry's own
  * fallback and is documented rather than hidden.
  *
  * Scale: url_parse is a per-row narrow projection (zero shuffles);
  * domain_rollup is one partial-agg exchange keyed by registered domain;
  * domain_blocklist is a BROADCAST join against the (tiny, by nature)
  * blocklist — at 100 TB the blocklist is still KBs, so no shuffle ever
  * touches the corpus side.
  *
  * Fixture note: the documents table carries no URL column, so the
  * registered queries compose the operators with [[withUrlFixture]] — a
  * deterministic doc_id-keyed URL synthesizer expressed identically in
  * both engines, covering the edge cases that break naive parsers:
  * userinfo, explicit ports, multi-part TLDs, IDN punycode hosts, query
  * strings. The operators ([[parseColumns]], [[registeredDomain]]) take
  * any URL column. */
object UrlQueries {

  /** One anchored pattern, capture groups: 1 scheme, 2 userinfo (no @),
    * 3 host, 4 port digits, 5 path, 6 query (no #). */
  val UrlPat = "^([a-z][a-z0-9+.-]*)://(?:([^/?#@]*)@)?([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?"

  /** Multi-part public suffixes the registered-domain heuristic widens
    * for. Curated, not exhaustive (see object doc). */
  val MultiSuffixes = Seq("co.uk", "com.au", "co.jp", "ac.uk")

  private val RegDomPat = {
    val alts = MultiSuffixes.map(_.replace(".", "\\.")).mkString("|")
    s"([^.]+\\.(?:$alts)|[^.]+\\.[^.]+)$$"
  }

  /** Registered domain of a host column (last 2 labels, 3 over the
    * multi-suffix set). A single-label host (rare: intranet names) yields
    * '' — callers see it grouped under the empty domain, not dropped. */
  def registeredDomain(host: Column): Column = regexp_extract(host, RegDomPat, 1)

  private def registeredDomainSql(host: String): String =
    s"regexp_extract($host, '$RegDomPat', 1)"

  /** Component columns of a URL column. */
  def parseColumns(url: Column): Seq[Column] = Seq(
    regexp_extract(url, UrlPat, 1).as("scheme"),
    regexp_extract(url, UrlPat, 2).as("userinfo"),
    regexp_extract(url, UrlPat, 3).as("host"),
    regexp_extract(url, UrlPat, 4).as("port"),
    regexp_extract(url, UrlPat, 5).as("path"),
    regexp_extract(url, UrlPat, 6).as("query"),
    registeredDomain(regexp_extract(url, UrlPat, 3)).as("registered_domain"))

  /** Host table keyed by doc_id % 7 — chosen so the SAME registered
    * domain arrives from multiple hosts (www/blog → example.com;
    * data/mirror → example.co.uk), exercising the rollup's whole point. */
  val Hosts = Seq(
    "www.example.com", "blog.example.com", "data.example.co.uk",
    "example.org", "xn--bcher-kva.de", "cdn.assets.example.net",
    "mirror.example.co.uk")

  /** Deterministic URL synthesis over the corpus: scheme by parity,
    * host from [[Hosts]], userinfo on the 11-stream, an explicit port on
    * the 13-stream, an index.html suffix on the 3-stream, a query string
    * on the 5-stream. Every component value is doc_id-derived. */
  def withUrlFixture(docs: DataFrame): DataFrame = {
    val id = col("doc_id").cast("string")
    val host = element_at(lit(Hosts.toArray), (col("doc_id") % 7).cast("int") + 1)
    docs.withColumn("url", concat(
      when(col("doc_id") % 2 === 0, lit("https")).otherwise(lit("http")),
      lit("://"),
      when(col("doc_id") % 11 === 0, concat(lit("u"), id, lit(":pw@"))).otherwise(lit("")),
      host,
      when(col("doc_id") % 13 === 0, lit(":8443")).otherwise(lit("")),
      lit("/p/"), (col("doc_id") % 1000).cast("string"),
      when(col("doc_id") % 3 === 0, lit("/index.html")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit("?ref=rss&s="), (col("doc_id") % 10).cast("string"))).otherwise(lit(""))))
  }

  /** The same synthesis in DuckDB SQL (emits doc_id, source, text, url).
    * DuckDB list literals are 1-indexed like Spark's element_at. */
  def fixtureSql: String = {
    val hostList = Hosts.map(h => s"'$h'").mkString("[", ", ", "]")
    // NOTE: no line here may START with '|' — consumer SQL builders run
    // stripMargin AFTER interpolating this block.
    s"""SELECT doc_id, source, text,
       |  (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://' ||
       |  CASE WHEN doc_id % 11 = 0 THEN 'u' || doc_id || ':pw@' ELSE '' END ||
       |  $hostList[(doc_id % 7)::INT + 1] ||
       |  CASE WHEN doc_id % 13 = 0 THEN ':8443' ELSE '' END ||
       |  '/p/' || (doc_id % 1000) ||
       |  CASE WHEN doc_id % 3 = 0 THEN '/index.html' ELSE '' END ||
       |  CASE WHEN doc_id % 5 = 0 THEN '?ref=rss&s=' || (doc_id % 10) ELSE '' END
       |  AS url
       |FROM documents""".stripMargin
  }

  private def parseColumnsSql: String = {
    def g(i: Int) = s"regexp_extract(url, '$UrlPat', $i)"
    s"""${g(1)} AS scheme, ${g(2)} AS userinfo, ${g(3)} AS host,
       |    ${g(4)} AS port, ${g(5)} AS path, ${g(6)} AS query,
       |    ${registeredDomainSql(g(3))} AS registered_domain""".stripMargin
  }

  /** Per-document URL decomposition. Per-row narrow, zero shuffles. */
  def urlParse(spark: SparkSession, dir: String): DataFrame =
    withUrlFixture(Tables.documents(spark, dir)).select(
      col("doc_id") +: col("url") +: parseColumns(col("url")): _*)

  def urlParseSql: String =
    s"""SELECT doc_id, url,
       |  ${parseColumnsSql.replace("\n", "\n")}
       |FROM (${fixtureSql.replace("\n", "\n  ")}) f""".stripMargin

  /** Corpus mass per registered domain — the input the domain_mixture
    * re-weighter consumes: documents, chars, and each domain's share of
    * the corpus in exact ppm. ONE corpus scan + one partial-agg exchange;
    * the share total is a whole-frame window over the already-aggregated
    * per-domain rows (the nation_revenue_share pattern — the window's
    * single-partition move touches only the tiny grouped frame, never the
    * corpus; deriving the total as a second aggregate would re-scan the
    * corpus, 2× IO at 100 TB). */
  def domainRollup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parsed = withUrlFixture(Tables.documents(spark, dir)).select(
      registeredDomain(regexp_extract(col("url"), UrlPat, 3)).as("registered_domain"),
      length(col("text")).cast("bigint").as("chars"))
    parsed.groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("n_chars"))
      .withColumn("tot_docs", sum(col("n_docs")).over(Window.partitionBy(lit(1))))
      // corpus-sized counts: DECIMAL(38,0) ceiling policy, div → bigint
      .withColumn("doc_share_ppm",
        expr("cast(n_docs as decimal(38,0)) * 1000000 div tot_docs"))
      .drop("tot_docs")
  }

  def domainRollupSql: String =
    s"""WITH parsed AS (
       |  SELECT ${registeredDomainSql(s"regexp_extract(url, '$UrlPat', 3)")} AS registered_domain,
       |    length(text) AS chars
       |  FROM (${fixtureSql.replace("\n", "\n  ")}) f),
       |per_domain AS (
       |  SELECT registered_domain, count(*) AS n_docs, sum(chars)::BIGINT AS n_chars
       |  FROM parsed GROUP BY registered_domain)
       |SELECT registered_domain, n_docs, n_chars,
       |  (n_docs * 1000000 // sum(n_docs) OVER ())::BIGINT AS doc_share_ppm
       |FROM per_domain""".stripMargin

  /** Tracking parameters stripped during canonicalization (the
    * RefinedWeb/CCNet step before URL-level dedup: the same page arrives
    * once per campaign variant unless utm-prefixed and click-id params
    * are dropped). */
  val TrackingParamPat = "^(utm_[a-z]+|gclid|fbclid|ref)="

  /** Canonical form of a URL, as ONE generated expression (engine
    * spellings differ only in the list-function names): lowercase host,
    * default port dropped (443/https, 80/http), userinfo and fragment
    * dropped (the parse pattern already stops at '#'), tracking params
    * removed and the REMAINING params sorted — so param-order noise and
    * campaign decorations collapse to one key. Higher-order array
    * functions end to end, no UDF. */
  private def canonicalExpr(url: String, spark: Boolean): String = {
    // Spark's SQL parser processes backslash escapes inside string
    // literals ('\?' collapses to '?'); DuckDB's does not — per-engine
    // spelling of the same pattern (the luhnVerdicts precedent)
    val pat = if (spark) UrlPat.replace("\\", "\\\\") else UrlPat
    def g(i: Int) = s"regexp_extract($url, '$pat', $i)"
    val kept =
      if (spark)
        s"array_join(array_sort(filter(split(${g(6)}, '&'), " +
          s"p -> p != '' AND NOT (p rlike '$TrackingParamPat'))), '&')"
      else
        s"coalesce(array_to_string(list_sort(list_filter(string_split(${g(6)}, '&'), " +
          s"p -> p != '' AND NOT regexp_matches(p, '$TrackingParamPat'))), '&'), '')"
    s"""${g(1)} || '://' || lower(${g(3)}) ||
       |    CASE WHEN ${g(4)} = '' OR (${g(1)} = 'https' AND ${g(4)} = '443')
       |              OR (${g(1)} = 'http' AND ${g(4)} = '80')
       |         THEN '' ELSE ':' || ${g(4)} END ||
       |    ${g(5)} ||
       |    CASE WHEN $kept = '' THEN '' ELSE '?' || $kept END""".stripMargin
  }

  /** Noisy-variant fixture for the canonicalization family: every doc
    * gets an https URL whose CANONICAL key space is deliberately small
    * (3 hosts × 20 paths × 4 real param values), while the raw strings
    * differ per doc — campaign params out of order on the 2-stream,
    * per-doc gclid on the 7-stream, fragments on the 3-stream, uppercase
    * hosts on the 11-stream, explicit default port on the 13-stream —
    * so canonicalization MUST collapse variants for the dedup-rate row
    * to read right. */
  def withUrlNoiseFixture(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val host = element_at(lit(Hosts.take(3).toArray), (id % 3).cast("int") + 1)
    docs.withColumn("url", concat(
      lit("https://"),
      when(id % 11 === 0, upper(host)).otherwise(host),
      when(id % 13 === 0, lit(":443")).otherwise(lit("")),
      lit("/p/"), (id % 20).cast("string"),
      when(id % 2 === 0,
        concat(lit("?utm_source=rss&s="), (id % 4).cast("string"), lit("&utm_medium=feed")))
        .otherwise(concat(lit("?s="), (id % 4).cast("string"))),
      when(id % 7 === 0, concat(lit("&gclid="), id.cast("string"))).otherwise(lit("")),
      when(id % 3 === 0, concat(lit("#sec"), id.cast("string"))).otherwise(lit(""))))
  }

  def noiseFixtureSql: String = {
    val hostList = Hosts.take(3).map(h => s"'$h'").mkString("[", ", ", "]")
    // NOTE: no line here may START with '|' — consumer SQL builders run
    // stripMargin AFTER interpolating this block.
    s"""SELECT doc_id, source, text,
       |  'https://' ||
       |  CASE WHEN doc_id % 11 = 0 THEN upper($hostList[(doc_id % 3)::INT + 1])
       |       ELSE $hostList[(doc_id % 3)::INT + 1] END ||
       |  CASE WHEN doc_id % 13 = 0 THEN ':443' ELSE '' END ||
       |  '/p/' || (doc_id % 20) ||
       |  CASE WHEN doc_id % 2 = 0
       |       THEN '?utm_source=rss&s=' || (doc_id % 4) || '&utm_medium=feed'
       |       ELSE '?s=' || (doc_id % 4) END ||
       |  CASE WHEN doc_id % 7 = 0 THEN '&gclid=' || doc_id ELSE '' END ||
       |  CASE WHEN doc_id % 3 = 0 THEN '#sec' || doc_id ELSE '' END
       |  AS url
       |FROM documents""".stripMargin
  }

  /** The canonicalization operator over a url column NAME — public so
    * callers (and the suite) can canonicalize any frame, not just the
    * fixture. */
  def canonicalColumn(urlColName: String): Column =
    expr(canonicalExpr(urlColName, spark = true))

  /** DuckDB spelling of the same, for consumer oracle builders
    * ([[HtmlQueries.htmlLinksSql]]). */
  def canonicalSqlExprFor(inner: String): String = canonicalExpr(inner, spark = false)

  /** Per-document canonicalization twin. Per-row narrow, zero shuffles. */
  def urlCanonical(spark: SparkSession, dir: String): DataFrame =
    withUrlNoiseFixture(Tables.documents(spark, dir)).select(
      col("doc_id"), col("url"),
      canonicalColumn("url").as("canonical_url"))

  def urlCanonicalSql: String =
    s"""SELECT doc_id, url,
       |  ${canonicalExpr("url", spark = false).replace("\n", "\n  ")} AS canonical_url
       |FROM (${noiseFixtureSql.replace("\n", "\n  ")}) f""".stripMargin

  /** The URL-dedup governance row: how many raw URL strings the corpus
    * carries vs how many canonical keys they collapse to, with the
    * collapse rate in exact ppm — the number that justifies running
    * canonicalization before URL-level dedup at all. One scan + the
    * two-distinct aggregate. */
  def urlDedupRate(spark: SparkSession, dir: String): DataFrame =
    urlCanonical(spark, dir)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_urls"),
        countDistinct(col("canonical_url")).as("n_canonical"))
      // corpus-sized counts: DECIMAL(38,0) ceiling policy, div → bigint
      .withColumn("collapse_ppm",
        expr("cast(n_urls - n_canonical as decimal(38,0)) * 1000000 div n_urls"))

  def urlDedupRateSql: String =
    s"""SELECT count(*) AS n_docs,
       |  count(DISTINCT url) AS n_urls,
       |  count(DISTINCT canonical_url) AS n_canonical,
       |  ((count(DISTINCT url) - count(DISTINCT canonical_url)) * 1000000
       |     // count(DISTINCT url))::BIGINT AS collapse_ppm
       |FROM (${urlCanonicalSql.replace("\n", "\n  ")}) c""".stripMargin

  /** The curated blocklist (registered domains). Tiny by nature — a
    * BROADCAST side, never shuffled against the corpus. */
  val Blocklist = Seq("example.co.uk", "xn--bcher-kva.de")

  /** Blocklist audit: per registered domain, whether it is blocked and
    * how many documents the filter keeps vs drops — the governance row a
    * curation pipeline publishes next to the filtered corpus. The join is
    * an explicit `broadcast()` left join (blocked = hit); a 1000-executor
    * cluster sees only the corpus-side partial agg exchange. */
  def domainBlocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val block = Blocklist.toDF("blocked_domain")
    val perDomain = withUrlFixture(Tables.documents(spark, dir)).select(
      registeredDomain(regexp_extract(col("url"), UrlPat, 3)).as("registered_domain"))
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"))
    perDomain.join(broadcast(block),
      col("registered_domain") === col("blocked_domain"), "left")
      .select(col("registered_domain"), col("n_docs"),
        col("blocked_domain").isNotNull.as("blocked"))
      .withColumn("n_kept", when(col("blocked"), 0L).otherwise(col("n_docs")))
      .withColumn("n_dropped", col("n_docs") - col("n_kept"))
  }

  def domainBlocklistSql: String = {
    val values = Blocklist.map(d => s"('$d')").mkString(", ")
    s"""WITH per_domain AS (
       |  SELECT ${registeredDomainSql(s"regexp_extract(url, '$UrlPat', 3)")} AS registered_domain,
       |    count(*) AS n_docs
       |  FROM (${fixtureSql.replace("\n", "\n  ")}) f
       |  GROUP BY 1),
       |block(blocked_domain) AS (VALUES $values)
       |SELECT registered_domain, n_docs,
       |  b.blocked_domain IS NOT NULL AS blocked,
       |  CASE WHEN b.blocked_domain IS NOT NULL THEN 0 ELSE n_docs END AS n_kept,
       |  n_docs - CASE WHEN b.blocked_domain IS NOT NULL THEN 0 ELSE n_docs END AS n_dropped
       |FROM per_domain LEFT JOIN block b ON registered_domain = b.blocked_domain""".stripMargin
  }
}
