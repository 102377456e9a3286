package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** HTML/markup text extraction — the boilerplate-strip ingest step every
  * web-crawl pipeline (C4 / RefinedWeb / trafilatura-jusText lineage) runs
  * BEFORE the scrubs this library already ships (PII, encoding repair,
  * dedup): strip script/style/comment blocks wholesale, drop the remaining
  * tags, decode the common entities, and normalize whitespace. Reference
  * scope: no analog in the reference engine; part of the LLM-pipeline
  * extension mandated alongside SURVEY.md §2.
  *
  * The extractor is deliberately RULE-BASED and deterministic (no DOM
  * parse, no ML boilerplate model): every rule is a regex/literal rewrite
  * that runs identically under Java regex (Spark) and RE2 (DuckDB) — inline
  * `(?is)` flags, lazy quantifiers and ASCII `\b` only, no backreferences,
  * no lookaround — so the operator is exactly oracle-checkable. Rule order
  * is semantic:
  *   1. `<script…>…</script>` and `<style…>…</style>` blocks are removed
  *      WITH their content (tag-stripping alone would leak JS/CSS payloads
  *      into the corpus — the classic C4 contamination);
  *   2. `<!-- … -->` comments are removed with their content;
  *   3. every remaining tag `<…>` becomes a single space (inner text of
  *      structural tags survives — title, headings, paragraphs);
  *   4. entities decode by literal replace, `&amp;` LAST so `&amp;lt;`
  *      yields the literal text `&lt;`, not `<` (double-escaped entities
  *      must not re-enter the tag alphabet after tag-stripping — decoding
  *      before stripping would let `&lt;script&gt;` text masquerade as
  *      markup);
  *   5. whitespace runs collapse to one space, ends trimmed.
  * Known precondition (documented, not hidden): script/style blocks must
  * be closed — an UNCLOSED `<script>` degrades to tag-stripping (the open
  * tag is removed, its text leaks). Real extractors share this failure
  * mode on truncated crawls; the leak counters in [[htmlEval]] are the
  * detection surface for it.
  *
  * Scale: per-row narrow projections of codegen'd string built-ins — zero
  * shuffles for extract/boilerplate, one summary aggregate for the eval.
  * The rule table is a plan constant. Column pruning reaches the scan.
  *
  * Fixture note: the synthetic corpus is clean word-salad with no markup,
  * so the registered queries compose the operators with [[withHtmlFixture]]
  * — a deterministic doc_id-keyed wrapping stage expressed identically in
  * both engines (every doc gets a page skeleton; script/style/comment/
  * entity arms land on their own residue streams). The operators
  * ([[extractColumn]], [[boilerplateColumns]]) take any text column. */
object HtmlQueries {

  /** Entity decode table in REPLACE ORDER: `&amp;` must be last (rule 4
    * above). The set is the HTML-2.0 core every crawler normalizes; rarer
    * numeric entities pass through untouched (conservative: unknown
    * entities are text, not markup). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private val ScriptPat = "(?is)<script\\b[^>]*>.*?</script>"
  private val StylePat = "(?is)<style\\b[^>]*>.*?</style>"
  private val CommentPat = "(?s)<!--.*?-->"
  private val TagPat = "(?s)<[^>]*>"
  private val WsPat = "\\s+"

  /** The extraction operator over any text column (rules 1–5). */
  def extractColumn(c: Column): Column = {
    val noBlocks = Seq(ScriptPat, StylePat, CommentPat, TagPat)
      .foldLeft(c)((acc, p) => regexp_replace(acc, p, " "))
    val decoded = Entities.foldLeft(noBlocks) { case (acc, (e, ch)) =>
      replace(acc, lit(e), lit(ch))
    }
    trim(regexp_replace(decoded, WsPat, " "))
  }

  private def sqlLit(s: String): String = s.replace("'", "''")

  /** The same extraction as a DuckDB SQL expression (RE2 spelling: the
    * identical patterns, options 'g'; inline flags ride in the pattern). */
  def extractSqlExpr(inner: String): String = {
    val noBlocks = Seq(ScriptPat, StylePat, CommentPat, TagPat)
      .foldLeft(inner)((acc, p) => s"regexp_replace($acc, '$p', ' ', 'g')")
    val decoded = Entities.foldLeft(noBlocks) { case (acc, (e, ch)) =>
      s"replace($acc, '${sqlLit(e)}', '${sqlLit(ch)}')"
    }
    s"trim(regexp_replace($decoded, '$WsPat', ' ', 'g'))"
  }

  /** Whitespace normalization alone (the eval's expected side — raw text
    * plus known plain-text arms, NOT tag-stripped). */
  private def normalize(c: Column): Column = trim(regexp_replace(c, WsPat, " "))
  private def normalizeSql(inner: String): String =
    s"trim(regexp_replace($inner, '$WsPat', ' ', 'g'))"

  /** Leak markers: strings that exist ONLY inside blocks the extractor
    * must remove with their content. Their survival count is the eval's
    * hard failure signal. */
  val ScriptMarker = "SCRIPTJUNK"
  val StyleMarker = "STYLEJUNK"
  val CommentMarker = "SNIPPEDCOMMENT"

  /** The entity arm's decoded plain-text form (what extraction must
    * produce from the encoded suffix below). */
  val EntityDecoded = " Tom & Jerry say <hello> \"loudly\" 'here' ok"
  private val EntityEncoded =
    " Tom &amp; Jerry say &lt;hello&gt; &quot;loudly&quot; &#39;here&#39;&nbsp;ok"

  /** Deterministic page-wrapping over the clean synthetic corpus: every
    * doc gets a full page skeleton (head/title/body — the title text `Doc
    * <id>` is REAL text the extractor must keep); script, style, comment
    * and entity arms land on the 3/5/7/11 residue streams (coprime, so
    * every combination occurs). All markup content is doc_id-derived so
    * no two docs wrap identically. */
  def withHtmlFixture(docs: DataFrame): DataFrame = {
    val id = col("doc_id").cast("string")
    docs.withColumn("html", concat(
      lit("<html><head><title>Doc "), id, lit("</title>"),
      when(col("doc_id") % 5 === 0,
        concat(lit("<style type=\"text/css\">.m"), id,
          lit(s" { color: #fff; /* $StyleMarker */ }</style>"))).otherwise(lit("")),
      lit("</head><body>"),
      when(col("doc_id") % 3 === 0,
        concat(lit("<script type=\"text/javascript\">var k"), id,
          lit(s" = 42; alert(\"$ScriptMarker\");</script>"))).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit("<!-- crawler-note "), id,
          lit(s" $CommentMarker -->"))).otherwise(lit("")),
      lit("<p class=\"body\">"), col("text"), lit("</p>"),
      when(col("doc_id") % 11 === 0,
        lit(s"<p>$EntityEncoded</p>")).otherwise(lit("")),
      lit("</body></html>")))
  }

  /** The same wrapping in DuckDB SQL (emits doc_id, source, text, html). */
  def fixtureSql: String =
    // NOTE: no line here may START with '|' — consumer SQL builders run
    // stripMargin AFTER interpolating this block.
    s"""SELECT doc_id, source, text,
       |  '<html><head><title>Doc ' || doc_id || '</title>' ||
       |  CASE WHEN doc_id % 5 = 0
       |       THEN '<style type="text/css">.m' || doc_id ||
       |            ' { color: #fff; /* $StyleMarker */ }</style>' ELSE '' END ||
       |  '</head><body>' ||
       |  CASE WHEN doc_id % 3 = 0
       |       THEN '<script type="text/javascript">var k' || doc_id ||
       |            ' = 42; alert("$ScriptMarker");</script>' ELSE '' END ||
       |  CASE WHEN doc_id % 7 = 0
       |       THEN '<!-- crawler-note ' || doc_id || ' $CommentMarker -->' ELSE '' END ||
       |  '<p class="body">' || text || '</p>' ||
       |  CASE WHEN doc_id % 11 = 0
       |       THEN '<p>${sqlLit(EntityEncoded)}</p>' ELSE '' END ||
       |  '</body></html>' AS html
       |FROM documents""".stripMargin

  /** Per-document extraction: the recovered text plus raw/extracted char
    * counts. Zero shuffles; the scan prunes to (doc_id, text). */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame =
    withHtmlFixture(Tables.documents(spark, dir)).select(
      col("doc_id"),
      extractColumn(col("html")).as("extracted"),
      length(col("html")).cast("bigint").as("n_chars_html"))
      .withColumn("n_chars_text", length(col("extracted")).cast("bigint"))

  def htmlExtractSql: String =
    s"""SELECT doc_id, ${extractSqlExpr("html")} AS extracted,
       |  length(html) AS n_chars_html,
       |  length(${extractSqlExpr("html")}) AS n_chars_text
       |FROM (${fixtureSql.replace("\n", "\n  ")}) f""".stripMargin

  /** Per-document markup-to-text ratio in exact ppm — the quality signal
    * curation pipelines threshold on (a page that is 95% markup is nav
    * chrome, not prose). boilerplate_ppm = chars REMOVED by extraction
    * per million raw chars. Per-row narrow, zero shuffles. */
  def boilerplateRate(spark: SparkSession, dir: String): DataFrame =
    withHtmlFixture(Tables.documents(spark, dir)).select(
      col("doc_id"),
      length(col("html")).cast("bigint").as("n_chars_html"),
      length(extractColumn(col("html"))).cast("bigint").as("n_chars_text"))
      // html length ≤ ~10⁹ per row in any real corpus: int64 is ample for
      // the per-row 10⁶ multiply (module overflow policy: per-row int64,
      // corpus-sum DECIMAL(38,0))
      .withColumn("boilerplate_ppm",
        expr("(n_chars_html - n_chars_text) * 1000000 div n_chars_html"))
      .withColumn("is_boilerplate_heavy", col("boilerplate_ppm") >= 500000L)

  def boilerplateRateSql: String =
    s"""SELECT doc_id, n_chars_html, n_chars_text,
       |  (n_chars_html - n_chars_text) * 1000000 // n_chars_html AS boilerplate_ppm,
       |  (n_chars_html - n_chars_text) * 1000000 // n_chars_html >= 500000 AS is_boilerplate_heavy
       |FROM (
       |  SELECT doc_id, length(html) AS n_chars_html,
       |    length(${extractSqlExpr("html")}) AS n_chars_text
       |  FROM (${fixtureSql.replace("\n", "\n  ")}) f) s""".stripMargin

  /** Eval twin (the pii_eval pattern): extraction scored against the
    * fixture's KNOWN ground truth. The expected text is constructible
    * without running the extractor — title words + normalized raw text +
    * the entity arm's decoded form — so exact-match counts are a real
    * oracle, not extractor-vs-itself. Leak counters pin the hard failure
    * mode: script/style/comment content surviving into the corpus. One
    * scan + one 1-row aggregate. */
  def htmlEval(spark: SparkSession, dir: String): DataFrame = {
    val expected = normalize(concat(
      lit("Doc "), col("doc_id").cast("string"), lit(" "), col("text"),
      when(col("doc_id") % 11 === 0, lit(EntityDecoded)).otherwise(lit(""))))
    withHtmlFixture(Tables.documents(spark, dir)).select(
      (extractColumn(col("html")) === expected).as("exact"),
      extractColumn(col("html")).contains(ScriptMarker).as("script_leak"),
      extractColumn(col("html")).contains(StyleMarker).as("style_leak"),
      extractColumn(col("html")).contains(CommentMarker).as("comment_leak"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("exact"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("script_leak"), 1L).otherwise(0L)).as("script_leaks"),
        sum(when(col("style_leak"), 1L).otherwise(0L)).as("style_leaks"),
        sum(when(col("comment_leak"), 1L).otherwise(0L)).as("comment_leaks"))
      .withColumn("exact_ppm",
        expr("cast(n_exact as decimal(38,0)) * 1000000 div n_docs"))
  }

  /** href-capturing anchor pattern (case-insensitive, double-quoted
    * attributes — the grammar the fixture emits; real crawls normalize
    * quoting upstream). Group 1 is the target. */
  val AnchorPat = "(?i)<a\\s[^>]*href=\"([^\"]*)\""

  /** Outlink targets for the link fixture: a small canonical space
    * (3 hosts × 10 paths) reached through noisy spellings, so the
    * in-degree rollup MUST canonicalize to read right. DuckDB spelling;
    * the Spark side uses element_at over the same host slice. */
  private def linkHostSql(idExpr: String): String =
    s"(${UrlQueries.Hosts.take(3).map(h => s"'$h'").mkString("[", ", ", "]")})[($idExpr % 3)::INT + 1]"

  /** Deterministic anchor injection: every doc links one canonical-space
    * target; the 4-stream adds a NOISY second anchor (uppercase host +
    * tracking param) at a neighboring target; the 9-stream adds a
    * RELATIVE link the extractor must drop (absolute-only contract —
    * real pipelines resolve relatives against a base URL this corpus
    * doesn't carry; dropping, not mangling, is the honest behavior). */
  def withLinkFixture(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val host = element_at(lit(UrlQueries.Hosts.take(3).toArray), (id % 3).cast("int") + 1)
    docs.withColumn("html", concat(
      lit("<html><body><p>"), col("text"), lit("</p>"),
      lit("<a href=\"https://"), host, lit("/t/"), (id % 10).cast("string"),
      lit("\">ref</a>"),
      when(id % 4 === 0, concat(
        lit("<A HREF=\"https://"), upper(host), lit("/t/"),
        ((id + 1) % 10).cast("string"), lit("?utm_source=feed\">noisy</A>")))
        .otherwise(lit("")),
      when(id % 9 === 0, lit("<a href=\"/local/nav\">rel</a>")).otherwise(lit("")),
      lit("</body></html>")))
  }

  def linkFixtureSql: String =
    // NOTE: no line here may START with '|' — consumer SQL builders run
    // stripMargin AFTER interpolating this block.
    s"""SELECT doc_id, source, text,
       |  '<html><body><p>' || text || '</p>' ||
       |  '<a href="https://' || ${linkHostSql("doc_id")} ||
       |  '/t/' || (doc_id % 10) || '">ref</a>' ||
       |  CASE WHEN doc_id % 4 = 0
       |       THEN '<A HREF="https://' || upper(${linkHostSql("doc_id")}) ||
       |            '/t/' || ((doc_id + 1) % 10) || '?utm_source=feed">noisy</A>' ELSE '' END ||
       |  CASE WHEN doc_id % 9 = 0 THEN '<a href="/local/nav">rel</a>' ELSE '' END ||
       |  '</body></html>' AS html
       |FROM documents""".stripMargin

  /** Per-document outlink extraction: absolute http(s) anchor targets,
    * exploded one row per link, each with its canonical form
    * ([[UrlQueries.canonicalColumn]] — the link-graph key). Per-row
    * narrow + explode; zero shuffles. */
  def htmlLinks(spark: SparkSession, dir: String): DataFrame =
    withLinkFixture(Tables.documents(spark, dir))
      .select(col("doc_id"),
        explode(filter(
          regexp_extract_all(col("html"), lit(AnchorPat), lit(1)),
          x => x.rlike("^https?://"))).as("link"))
      .withColumn("canonical_link", UrlQueries.canonicalColumn("link"))

  def htmlLinksSql: String =
    s"""SELECT doc_id, link,
       |  ${UrlQueries.canonicalSqlExprFor("link").replace("\n", "\n  ")} AS canonical_link
       |FROM (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_extract_all(html, '$AnchorPat', 1),
       |    x -> regexp_matches(x, '^https?://'))) AS link
       |  FROM (${linkFixtureSql.replace("\n", "\n  ")}) f) u""".stripMargin

  /** The link-graph in-degree rollup keyed by CANONICAL target — what a
    * crawl scheduler or PageRank seed pass consumes. One partial-agg
    * exchange; the noisy variants collapse onto their target or the
    * in-degree double-counts campaign spellings. */
  def linkIndegree(spark: SparkSession, dir: String): DataFrame =
    htmlLinks(spark, dir)
      .groupBy(col("canonical_link"))
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col("doc_id")).as("n_docs"))

  def linkIndegreeSql: String =
    s"""SELECT canonical_link, count(*) AS n_refs,
       |  count(DISTINCT doc_id) AS n_docs
       |FROM (${htmlLinksSql.replace("\n", "\n  ")}) l
       |GROUP BY canonical_link""".stripMargin

  def htmlEvalSql: String = {
    val expected = normalizeSql(
      s"('Doc ' || doc_id || ' ' || text || CASE WHEN doc_id % 11 = 0 " +
        s"THEN '${sqlLit(EntityDecoded)}' ELSE '' END)")
    s"""SELECT count(*) AS n_docs,
       |  sum(CASE WHEN exact THEN 1 ELSE 0 END)::BIGINT AS n_exact,
       |  sum(CASE WHEN script_leak THEN 1 ELSE 0 END)::BIGINT AS script_leaks,
       |  sum(CASE WHEN style_leak THEN 1 ELSE 0 END)::BIGINT AS style_leaks,
       |  sum(CASE WHEN comment_leak THEN 1 ELSE 0 END)::BIGINT AS comment_leaks,
       |  (sum(CASE WHEN exact THEN 1 ELSE 0 END) * 1000000 // count(*))::BIGINT AS exact_ppm
       |FROM (
       |  SELECT ${extractSqlExpr("html")} = $expected AS exact,
       |    contains(${extractSqlExpr("html")}, '$ScriptMarker') AS script_leak,
       |    contains(${extractSqlExpr("html")}, '$StyleMarker') AS style_leak,
       |    contains(${extractSqlExpr("html")}, '$CommentMarker') AS comment_leak
       |  FROM (${fixtureSql.replace("\n", "\n  ")}) f) s""".stripMargin
  }
}
