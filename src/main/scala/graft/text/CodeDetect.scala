package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Code-vs-prose detection — The Stack / StarCoder-lineage corpora split
  * crawled text into code and prose before mixing (code is tokenized,
  * weighted and deduplicated differently), and the Gopher quality gate
  * uses the same verdict to keep source files out of prose buckets.
  * Reference scope: no analog in the reference engine; part of the
  * LLM-pipeline extension mandated alongside SURVEY.md §2.
  *
  * Signals are deterministic and LINE-STRUCTURE-FREE by design: upstream
  * of this operator sits [[HtmlQueries]] extraction, which collapses all
  * whitespace — so indentation and line-length signals (the classic
  * detector features) are unreliable here, and the detector leans on what
  * survives collapsing: code-punctuation density (braces, semicolons,
  * parens, assignment) and reserved-word hits. Each signal is a
  * length-difference or regexp count of codegen'd built-ins — exactly
  * oracle-checkable, no UDFs.
  *
  * The score is an integer ppm density: punctuation/keyword mass per
  * million characters. The weights favor punctuation over keywords —
  * prose legitimately uses "function" and "return" as English words (the
  * eval's hard negative pins this), but brace/semicolon density is the
  * signal English essentially never produces.
  *
  * Scale: per-row narrow projections, zero shuffles for the verdict; one
  * 1-row aggregate for the eval. The detector feeds `domain_mixture` and
  * the Gopher gate as one more per-doc column.
  *
  * Fixture note: the synthetic corpus is prose-like word-salad, so the
  * registered queries compose the detector with [[withCodeFixture]] — a
  * deterministic doc_id-keyed injection: a dense code snippet on the
  * 6-residue stream and a PROSE hard negative carrying code keywords and
  * an inline code span on the 25-residue stream (coprime streams, both
  * combinations occur). The operator ([[signalColumns]], [[scoreColumn]])
  * takes any text column. */
object CodeDetect {

  /** Reserved words counted as keyword hits: chosen to be strong code
    * markers and ABSENT from ordinary prose vocabulary except in
    * deliberate hard negatives ("the function of art…"). Word-bounded,
    * case-sensitive (lowercase keywords; `Function` in prose stays
    * uncounted). */
  val Keywords = Seq("function", "var", "return", "const", "let",
    "def", "import", "void", "elif", "lambda")

  val KeywordPat: String = s"\\b(${Keywords.mkString("|")})\\b"

  /** (signal name, weight). Punctuation dominates (see object doc):
    * braces are the near-unforgeable code marker, semicolons next; the
    * keyword weight is deliberately small enough that a prose sentence
    * using four keyword-words as English stays far under threshold. */
  val Weights: Seq[(String, Long)] = Seq(
    "n_braces" -> 20L, "n_semis" -> 10L, "n_parens" -> 2L,
    "n_assign" -> 2L, "n_keywords" -> 5L)

  /** Verdict threshold on the weighted ppm density. Separation bounds:
    * code-stream docs score ≥ ~440k (snippet mass ≈ 348 over ≤ ~790
    * chars at the corpus's 48–553 char doc range), the prose hard
    * negative ≤ ~186k in-fixture and ~258k even STANDALONE (mass 32 over
    * its own 124 chars — the worst case a keyword-bearing sentence can
    * reach with one `x = 1` span), clean salad ≈ 0. 300k sits above the
    * undiluted hard negative and well under half the code floor.
    * CodeDetectSuite pins both sides on controlled strings. */
  val ThresholdPpm = 300000L

  /** Per-row signal columns over `t`: counts of {}, ;, (), = and
    * keyword hits. Length-difference arithmetic for the single chars
    * (exact, cheapest), regexp count for the word-bounded keywords. */
  def signalColumns(t: Column): Seq[Column] = Seq(
    (length(t) - length(replace(replace(t, lit("{"), lit("")), lit("}"), lit(""))))
      .cast("bigint").as("n_braces"),
    (length(t) - length(replace(t, lit(";"), lit("")))).cast("bigint").as("n_semis"),
    (length(t) - length(replace(replace(t, lit("("), lit("")), lit(")"), lit(""))))
      .cast("bigint").as("n_parens"),
    (length(t) - length(replace(t, lit("="), lit("")))).cast("bigint").as("n_assign"),
    regexp_count(t, lit(KeywordPat)).cast("bigint").as("n_keywords"))

  private def signalSql: Seq[(String, String)] = Seq(
    "n_braces" -> "length(text) - length(replace(replace(text, '{', ''), '}', ''))",
    "n_semis" -> "length(text) - length(replace(text, ';', ''))",
    "n_parens" -> "length(text) - length(replace(replace(text, '(', ''), ')', ''))",
    "n_assign" -> "length(text) - length(replace(text, '=', ''))",
    "n_keywords" -> s"len(regexp_extract_all(text, '$KeywordPat'))")

  private def massSql: String =
    Weights.map { case (n, w) => s"$n * $w" }.mkString("(", " + ", ")")

  /** Weighted ppm density over precomputed signal columns — integer
    * `div`, never `/` (Spark's `/` on longs yields double; the oracle's
    * `//` is integer). Per-row int64 is ample: weight mass × 10⁶ stays
    * far under 2⁶³ for any single document. */
  def scoreColumn: Column = expr(s"$massSql * 1000000 div n_chars")

  /** The dense snippet injected on the code stream — deliberately
    * single-line (survives whitespace collapsing, which upstream HTML
    * extraction applies to everything) and doc_id-derived so no two docs
    * share it. ~230 chars of real JS shape, mass ≈ 352 under [[Weights]]. */
  def codeSnippet(id: Column): Column = concat(
    lit(" function calc"), id, lit("(x) { var acc = 0; for (var i = 0; i < x; i = i + 1) { "),
    lit("acc = acc + (i * "), id, lit(" % 7); } if (acc > 100) { return acc; } "),
    lit("let y = acc * 2; const z = y + 1; var w = (z * z) % 97; if (w == 0) { w = 1; } return (w + z); }"))

  private def codeSnippetSql: String =
    "' function calc' || doc_id || '(x) { var acc = 0; for (var i = 0; i < x; i = i + 1) { ' ||" +
      " 'acc = acc + (i * ' || doc_id || ' % 7); } if (acc > 100) { return acc; } ' ||" +
      " 'let y = acc * 2; const z = y + 1; var w = (z * z) % 97; if (w == 0) { w = 1; } return (w + z); }'"

  /** The prose hard negative: keyword words used as English plus an
    * inline code span — a quality gate must NOT flag this as code. */
  val HardNegative = " She said the function of art is to return us to wonder;" +
    " let that stand, and import nothing more — see `x = 1` for contrast."

  /** Deterministic injection: code on the 6-stream, prose-with-keywords
    * on the 25-stream. */
  def withCodeFixture(docs: DataFrame): DataFrame = docs.withColumn("text",
    concat(col("text"),
      when(col("doc_id") % 6 === 0, codeSnippet(col("doc_id").cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 25 === 0, lit(HardNegative)).otherwise(lit(""))))

  def fixtureSql: String =
    // NOTE: no line here may START with '|' — consumer SQL builders run
    // stripMargin AFTER interpolating this block.
    s"""SELECT doc_id, source, text ||
       |  CASE WHEN doc_id % 6 = 0 THEN ${codeSnippetSql} ELSE '' END ||
       |  CASE WHEN doc_id % 25 = 0 THEN '${HardNegative.replace("'", "''")}' ELSE '' END
       |  AS text
       |FROM documents""".stripMargin

  /** Per-document code detection: the raw signals, the weighted ppm
    * score, and the verdict. Zero shuffles. */
  def codeDetect(spark: SparkSession, dir: String): DataFrame =
    withCodeFixture(Tables.documents(spark, dir))
      .select(col("doc_id") +: length(col("text")).cast("bigint").as("n_chars") +:
        signalColumns(col("text")): _*)
      .withColumn("score_ppm", scoreColumn)
      .withColumn("is_code", col("score_ppm") >= ThresholdPpm)

  def codeDetectSql: String = {
    val sigs = signalSql.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")
    val mass = Weights.map { case (n, w) => s"$n * $w" }.mkString(" + ")
    s"""SELECT doc_id, n_chars, ${Weights.map(_._1).mkString(", ")},
       |  ($mass) * 1000000 // n_chars AS score_ppm,
       |  ($mass) * 1000000 // n_chars >= $ThresholdPpm AS is_code
       |FROM (
       |  SELECT doc_id, length(text) AS n_chars,
       |  $sigs
       |  FROM (${fixtureSql.replace("\n", "\n  ")}) f) s""".stripMargin
  }

  /** Eval twin: the verdict scored against the fixture's residue-stream
    * ground truth (truly-code ⇔ the 6-stream), with the 25-stream prose
    * hard negative inside the scored population. Exact-ppm
    * precision/recall; one scan + one 1-row aggregate. */
  def codeEval(spark: SparkSession, dir: String): DataFrame =
    codeDetect(spark, dir)
      .select(col("is_code").as("det"), (col("doc_id") % 6 === 0).as("exp"))
      .agg(
        sum(when(col("det") && col("exp"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("det") && !col("exp"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("det") && col("exp"), 1L).otherwise(0L)).as("fn"),
        count(lit(1)).as("n_docs"))
      .withColumn("precision_ppm",
        expr("cast(tp as decimal(38,0)) * 1000000 div (tp + fp)"))
      .withColumn("recall_ppm",
        expr("cast(tp as decimal(38,0)) * 1000000 div (tp + fn)"))

  def codeEvalSql: String =
    s"""SELECT sum(CASE WHEN det AND exp THEN 1 ELSE 0 END)::BIGINT AS tp,
       |  sum(CASE WHEN det AND NOT exp THEN 1 ELSE 0 END)::BIGINT AS fp,
       |  sum(CASE WHEN NOT det AND exp THEN 1 ELSE 0 END)::BIGINT AS fn,
       |  count(*) AS n_docs,
       |  (sum(CASE WHEN det AND exp THEN 1 ELSE 0 END) * 1000000
       |     // (sum(CASE WHEN det AND exp THEN 1 ELSE 0 END)
       |        + sum(CASE WHEN det AND NOT exp THEN 1 ELSE 0 END)))::BIGINT AS precision_ppm,
       |  (sum(CASE WHEN det AND exp THEN 1 ELSE 0 END) * 1000000
       |     // (sum(CASE WHEN det AND exp THEN 1 ELSE 0 END)
       |        + sum(CASE WHEN NOT det AND exp THEN 1 ELSE 0 END)))::BIGINT AS recall_ppm
       |FROM (
       |  SELECT is_code AS det, doc_id % 6 = 0 AS exp
       |  FROM (${codeDetectSql.replace("\n", "\n  ")}) d) s""".stripMargin
}
