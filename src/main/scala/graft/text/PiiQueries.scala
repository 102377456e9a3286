package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Span-level PII detection and redaction — the scrub pass every
  * production training-data pipeline runs before anything is tokenized
  * (the C4 / Gopher / RefinedWeb lineage: emails, phone numbers, IP
  * addresses, and ID-shaped digit runs are removed or masked before
  * training). Reference scope: the reference engine has no PII surface;
  * this family is part of the LLM-pipeline extension mandated alongside
  * SURVEY.md §2 (dedup/similarity/text-analysis).
  *
  * Design: every operator is a per-row narrow projection of codegen'd
  * built-ins (`regexp_count` / `regexp_replace` — native Catalyst
  * expressions, no UDFs), so the scan and the redaction parallelize
  * embarrassingly at any scale: zero shuffles for [[piiScan]] and
  * [[piiRedact]], exactly one partial-agg exchange for [[piiAudit]].
  * Column pruning reaches the parquet scan (only doc_id/source/text are
  * read).
  *
  * The pattern set is deliberately regex-class (no checksum validation,
  * no ML NER): deterministic, engine-portable (every pattern below runs
  * identically under Java regex and DuckDB's RE2 — no backreferences, no
  * lookaround, ASCII word boundaries only), and exactly oracle-checkable.
  *
  * Fixture note: the synthetic corpus is clean word-salad, so the
  * registered queries compose the operators with [[withPiiFixture]] — a
  * deterministic doc_id-keyed injection stage expressed identically in
  * both engines. The OPERATORS ([[scanColumns]], [[redactColumn]]) take
  * any text column; the fixture exists only because the test corpus
  * carries no PII to find. */
object PiiQueries {

  /** PII classes in REDACTION ORDER: (name, pattern, mask token). Order is
    * semantic, not cosmetic — an email's local part may contain a ≥9-digit
    * run and an IP literal contains short digit runs, so the more specific
    * classes must consume their spans before the bare digit-run class
    * scans what remains. Scanning (per-class counts) is order-independent
    * because counts are taken per class on the ORIGINAL text. */
  val Classes: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv6", "\\b([0-9a-f]{1,4}:){7}[0-9a-f]{1,4}\\b", "[IPV6]"),
    ("ipv4", "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "[IPV4]"),
    ("phone", "\\+\\d{1,2}-\\d{3}-\\d{4}\\b", "[PHONE]"),
    ("id", "\\b\\d{9,}\\b", "[ID]"))

  /** Deterministic PII injection over the clean synthetic corpus: each
    * class lands on its own doc_id residue stream (3/5/7/11/13 — coprime,
    * so every subset combination occurs), with span VALUES derived from
    * doc_id so no two docs carry the same span. Expressed as the exact
    * same arithmetic in [[fixtureSql]]. */
  def withPiiFixture(docs: DataFrame): DataFrame = docs.withColumn("text",
    concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" Reach user"), col("doc_id"), lit("@example.com anytime.")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" Call +1-555-"), lpad(col("doc_id") % 10000, 4, "0"), lit(" now.")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" Logged from 10."), col("doc_id") % 256, lit("."),
          expr("(doc_id div 3) % 256"), lit("."), col("doc_id") % 200 + 1, lit(".")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" Node 2001:0db8:"), lpad(lower(hex(col("doc_id") % 65536)), 4, "0"),
          lit(":0000:0000:8a2e:0370:7334 up.")))
        .otherwise(lit("")),
      when(col("doc_id") % 13 === 0,
        concat(lit(" Case ref "), lpad(col("doc_id"), 9, "0"), lit(" pending.")))
        .otherwise(lit(""))))

  /** The same injection in DuckDB SQL (`//` is DuckDB integer division;
    * `to_hex`/`lpad` mirror Spark's `hex`/`lpad`). */
  def fixtureSql: String =
    // NOTE: no line here may START with '|' — the consumer SQL builders
    // run stripMargin AFTER interpolating this block, which would eat one
    // pipe of a leading '||'.
    """SELECT doc_id, source, text ||
      |  CASE WHEN doc_id % 3 = 0
      |       THEN ' Reach user' || doc_id || '@example.com anytime.' ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0
      |       THEN ' Call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' now.' ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0
      |       THEN ' Logged from 10.' || (doc_id % 256) || '.' || ((doc_id // 3) % 256) ||
      |            '.' || (doc_id % 200 + 1) || '.' ELSE '' END ||
      |  CASE WHEN doc_id % 11 = 0
      |       THEN ' Node 2001:0db8:' || lpad(lower(to_hex(doc_id % 65536)), 4, '0') ||
      |            ':0000:0000:8a2e:0370:7334 up.' ELSE '' END ||
      |  CASE WHEN doc_id % 13 = 0
      |       THEN ' Case ref ' || lpad(doc_id::VARCHAR, 9, '0') || ' pending.' ELSE '' END
      |  AS text
      |FROM documents""".stripMargin

  /** Per-class span counts of `text` — the reusable scan operator. */
  def scanColumns(text: Column): Seq[Column] =
    Classes.map { case (name, pat, _) =>
      regexp_count(text, lit(pat)).cast("bigint").as(s"n_$name")
    }

  /** Chained class-ordered masking of `text` — the reusable redaction
    * operator. Non-PII bytes pass through untouched (regexp_replace
    * rewrites matched spans only; PiiSuite pins conservation). */
  def redactColumn(text: Column): Column =
    Classes.foldLeft(text) { case (acc, (_, pat, mask)) =>
      regexp_replace(acc, pat, mask)
    }

  private def redactSqlExpr(inner: String): String =
    Classes.foldLeft(inner) { case (acc, (_, pat, mask)) =>
      s"regexp_replace($acc, '$pat', '$mask', 'g')"
    }

  /** Adversarial hard negatives appended to EVERY document by the eval
    * twin: each is one character away from a class pattern and must fire
    * nothing — a version-ish dotted quad with no leading word boundary, an
    * 8-digit run (below the ≥9 ID floor), a 3-digit phone tail, and a
    * TLD-less mail-shaped token. */
  val HardNegativeTail =
    " v1.2.3.4 order 12345678 ping +1-555-123 mail user@localhost done"

  /** Eval twin: per-class precision/recall of [[scanColumns]] against the
    * fixture's KNOWN injected spans (the doc_id residue streams are the
    * ground truth), with [[HardNegativeTail]] appended to every document
    * so the detector is also scored against near-miss text it must NOT
    * match. Per (doc, class): TP = min(detected, injected),
    * FP = detected − TP, FN = injected − TP; ppm ratios over the class
    * totals. A 10⁶ ppm on every row is the operator's exactness proof —
    * any regex drift in either engine breaks this row before it breaks a
    * production scrub. Same shape as `dedup_eval`/`ann_recall`: every
    * approximate-or-pattern operator ships its eval. */
  def piiEval(spark: SparkSession, dir: String): DataFrame = {
    val fixture = withPiiFixture(Tables.documents(spark, dir))
      .withColumn("text", concat(col("text"), lit(HardNegativeTail)))
    val residues = Map("email" -> 3, "phone" -> 5, "ipv4" -> 7,
      "ipv6" -> 11, "id" -> 13)
    // ONE scan computes every class's (detected, expected) pair, then a
    // stack() unpivot emits the per-class rows — a 5-arm union would
    // re-scan the corpus once per class. (At toy scale the union reads
    // FASTER — five branches get five parallel tasks where one tiny file
    // yields one or two — but that is split-count parallelism a real
    // corpus has in abundance; the single-scan plan does 5× less IO.)
    val perDoc = fixture.select(col("doc_id") +:
      (scanColumns(col("text")) ++ Classes.map { case (name, _, _) =>
        when(col("doc_id") % residues(name) === 0, 1L).otherwise(0L).as(s"e_$name")
      }): _*)
    val stackArgs = Classes.map { case (name, _, _) =>
      s"'$name', n_$name, e_$name"
    }.mkString(", ")
    val stacked = perDoc.selectExpr(
      s"stack(${Classes.size}, $stackArgs) AS (class, det, exp)")
    stacked
      .select(col("class"), col("det"), col("exp"),
        least(col("det"), col("exp")).as("tp"))
      .groupBy(col("class"))
      .agg(sum(col("tp")).as("tp"),
        sum(col("det") - col("tp")).as("fp"),
        sum(col("exp") - col("tp")).as("fn"),
        sum(col("det")).as("detected"),
        sum(col("exp")).as("injected"))
      // tp is a corpus-sized span count: the 10⁶ multiply runs in
      // DECIMAL(38,0) per the module ceiling policy (div → bigint)
      .withColumn("precision_ppm", when(col("detected") > 0,
        expr("cast(tp as decimal(38,0)) * 1000000 div detected")).otherwise(lit(null)))
      .withColumn("recall_ppm", when(col("injected") > 0,
        expr("cast(tp as decimal(38,0)) * 1000000 div injected")).otherwise(lit(null)))
  }

  def piiEvalSql: String = {
    val residues = Map("email" -> 3, "phone" -> 5, "ipv4" -> 7,
      "ipv6" -> 11, "id" -> 13)
    val arms = Classes.map { case (name, pat, _) =>
      s"""SELECT '$name' AS class,
         |  len(regexp_extract_all(text, '$pat')) AS det,
         |  CASE WHEN doc_id % ${residues(name)} = 0 THEN 1 ELSE 0 END AS exp
         |FROM f""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH f AS (
       |  SELECT doc_id, text || '$HardNegativeTail' AS text
       |  FROM (${fixtureSql.replace("\n", "\n  ")}) raw),
       |stacked AS (
       |${arms.replace("\n", "\n")}),
       |scored AS (
       |  SELECT class, det, exp, least(det, exp) AS tp FROM stacked)
       |SELECT class, sum(tp)::BIGINT AS tp, sum(det - tp)::BIGINT AS fp,
       |  sum(exp - tp)::BIGINT AS fn, sum(det)::BIGINT AS detected,
       |  sum(exp)::BIGINT AS injected,
       |  CASE WHEN sum(det) > 0 THEN (sum(tp) * 1000000 // sum(det))::BIGINT END AS precision_ppm,
       |  CASE WHEN sum(exp) > 0 THEN (sum(tp) * 1000000 // sum(exp))::BIGINT END AS recall_ppm
       |FROM scored GROUP BY class""".stripMargin
  }

  /** Card-number candidate pattern: contiguous 13–19 digit runs (PAN
    * lengths per ISO/IEC 7812). Deliberately narrower than validation —
    * the Luhn check below is what separates a real PAN from a random
    * digit run. */
  val CcnumPattern = "\\b\\d{13,19}\\b"

  /** The Luhn mod-10 verdict over every [[CcnumPattern]] candidate in
    * `t`, as ONE generated SQL expression built from higher-order array
    * functions (transform/aggregate — codegen'd Catalyst expressions, no
    * UDF): for each candidate, digits are weighted from the RIGHT
    * (odd offsets doubled, 9-subtracted past 9) and summed; valid ⇔
    * sum % 10 = 0. `fold` abstracts the two engines' spellings
    * (Spark `aggregate(seq, 0, (acc, i) -> …)` vs DuckDB
    * `list_sum(list_transform(range, i -> …))`). */
  private def luhnVerdicts(t: String, spark: Boolean): String = {
    def digit(pos: String) = s"(ascii(substr(c, $pos, 1)) - 48)"
    val d = digit(if (spark) s"length(c) - i" else s"(length(c) - i)::INT")
    val term = s"CASE WHEN i % 2 = 0 THEN $d" +
      s" WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END"
    // Spark's SQL parser processes backslash escapes inside string
    // literals ('\d' collapses to 'd'), DuckDB's does not — the same
    // regex needs per-engine spelling inside a generated expression
    if (spark)
      s"transform(regexp_extract_all($t, '${CcnumPattern.replace("\\", "\\\\")}', 0), c -> " +
        s"aggregate(sequence(0, length(c) - 1), 0, (acc, i) -> acc + ($term)) % 10 = 0)"
    else
      s"list_transform(regexp_extract_all($t, '$CcnumPattern'), c -> " +
        s"list_sum(list_transform(range(0, length(c)), i -> ($term))) % 10 = 0)"
  }

  /** Deterministic PAN injection for the Luhn family: a Luhn-VALID
    * 16-digit test PAN, a one-digit-off INVALID twin, and a 13-digit
    * valid PAN, on coprime residue streams (19/23/29). All are the
    * industry's published test numbers — no real account numbers. */
  private val LuhnFixtureArms = Seq(
    (19, " card 4111111111111111 on file."),
    (23, " card 4111111111111112 rejected."),
    (29, " legacy pan 4222222222222 archived."))

  def withLuhnFixture(docs: DataFrame): DataFrame = docs.withColumn("text",
    concat(col("text") +: LuhnFixtureArms.map { case (m, s) =>
      when(col("doc_id") % m === 0, lit(s)).otherwise(lit(""))
    }: _*))

  def luhnFixtureSql: String =
    "SELECT doc_id, text" + LuhnFixtureArms.map { case (m, s) =>
      s" ||\n  CASE WHEN doc_id % $m = 0 THEN '$s' ELSE '' END"
    }.mkString + "\n  AS text\nFROM documents"

  /** The Spark-side verdict expression over a column named `text`,
    * exposed for PiiSuite's reference-Luhn comparison. */
  private[graft] def luhnVerdictsForTest: String = luhnVerdicts("text", spark = true)

  /** Per-document PAN detection with checksum validation: candidate
    * digit runs, how many pass Luhn, and the boolean verdict. The whole
    * check runs inside whole-stage codegen (higher-order functions over
    * the extracted candidate array) — per-row narrow, zero shuffles,
    * scan pruned to (doc_id, text). The id-class digit-run scan flags
    * these same runs as generic IDs; this operator is the
    * payment-specific refinement a scrub pipeline applies when deciding
    * mask class and audit severity. */
  def piiLuhn(spark: SparkSession, dir: String): DataFrame = {
    val verdicts = luhnVerdicts("text", spark = true)
    withLuhnFixture(Tables.documents(spark, dir)).select(
      col("doc_id"),
      expr(s"size($verdicts)").cast("bigint").as("n_ccnum"),
      expr(s"size(filter($verdicts, v -> v))").cast("bigint").as("n_luhn_valid"))
      .withColumn("has_valid_cc", col("n_luhn_valid") > 0)
  }

  def piiLuhnSql: String = {
    val verdicts = luhnVerdicts("text", spark = false)
    s"""SELECT doc_id,
       |  len($verdicts) AS n_ccnum,
       |  len(list_filter($verdicts, v -> v)) AS n_luhn_valid,
       |  len(list_filter($verdicts, v -> v)) > 0 AS has_valid_cc
       |FROM (${luhnFixtureSql.replace("\n", "\n  ")}) f""".stripMargin
  }

  /** IBAN candidate pattern: 2 uppercase country letters, 2 check digits,
    * then 11–30 alphanumerics (total 15–34 per ISO 13616). Candidacy is
    * deliberately wider than validity — the mod-97 check below is what
    * separates a real IBAN from an ID-shaped token. */
  val IbanPattern = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b"

  /** 10^k mod 97 for k = 0..67 — the position-weight table that turns the
    * ISO 13616 big-integer mod into a SUM of per-digit terms (Σ dᵢ·10^k ≡
    * Σ dᵢ·(10^k mod 97) (mod 97); terms ≤ 9·96, sums ≤ 68·9·96 ≈ 59k —
    * int32-safe). 68 entries: a 34-char all-letter-tail IBAN expands to at
    * most 68 digits. PiiSuite pins the table against BigInteger. */
  private[graft] val Pow97: Seq[Int] =
    Iterator.iterate(1)(p => p * 10 % 97).take(68).toSeq

  /** ISO 13616 letter expansion (A→10 … Z→35) as a chained literal
    * replace over the REARRANGED candidate (first 4 chars moved to the
    * end). Replacement introduces only digits and digits are never
    * replaced, so the chain cannot cascade and its order is immaterial. */
  private def ibanExpand(c: String): String =
    ('A' to 'Z').foldLeft(s"(substr($c, 5) || substr($c, 1, 4))") { (acc, ch) =>
      s"replace($acc, '$ch', '${ch - 'A' + 10}')"
    }

  /** The mod-97 verdict over every [[IbanPattern]] candidate in `t`, as
    * ONE generated expression of higher-order array functions (the Luhn
    * trick from [[luhnVerdicts]], generalized to a positional fold:
    * letters expand to two digits FIRST, then the weighted digit sum runs
    * against the [[Pow97]] table — valid ⇔ sum ≡ 1 (mod 97)). The
    * two-level transform keeps the 26-deep expansion expression evaluated
    * ONCE per candidate; the inner lambda references only its own `e`. */
  private def ibanVerdicts(t: String, spark: Boolean): String = {
    val pow = Pow97.mkString(if (spark) "array(" else "[", ", ", if (spark) ")" else "]")
    if (spark) {
      val term = s"(ascii(substr(e, i, 1)) - 48) * element_at($pow, length(e) - i + 1)"
      s"transform(transform(regexp_extract_all($t, '${IbanPattern.replace("\\", "\\\\")}', 0), " +
        s"c -> ${ibanExpand("c")}), e -> " +
        s"aggregate(sequence(1, length(e)), 0, (acc, i) -> acc + $term) % 97 = 1)"
    } else {
      val term = s"(ascii(substr(e, i::INT, 1)) - 48) * ($pow)[(length(e) - i + 1)::INT]"
      s"list_transform(list_transform(regexp_extract_all($t, '$IbanPattern'), " +
        s"c -> ${ibanExpand("c")}), e -> " +
        s"list_sum(list_transform(range(1, length(e) + 1), i -> $term)) % 97 = 1)"
    }
  }

  /** The Spark-side verdict expression over a column named `text`,
    * exposed for PiiSuite's BigInteger-reference comparison. */
  private[graft] def ibanVerdictsForTest: String = ibanVerdicts("text", spark = true)

  /** Deterministic IBAN injection: the two canonical published example
    * IBANs (GB/DE — test values, not accounts) and a one-digit-off
    * INVALID twin of the GB one, on coprime residue streams (31/37/41). */
  private val IbanFixtureArms = Seq(
    (31, " iban GB82WEST12345698765432 on record."),
    (37, " sepa DE89370400440532013000 cleared."),
    (41, " iban GB82WEST12345698765433 rejected."))

  def withIbanFixture(docs: DataFrame): DataFrame = docs.withColumn("text",
    concat(col("text") +: IbanFixtureArms.map { case (m, s) =>
      when(col("doc_id") % m === 0, lit(s)).otherwise(lit(""))
    }: _*))

  def ibanFixtureSql: String =
    "SELECT doc_id, text" + IbanFixtureArms.map { case (m, s) =>
      s" ||\n  CASE WHEN doc_id % $m = 0 THEN '$s' ELSE '' END"
    }.mkString + "\n  AS text\nFROM documents"

  /** Per-document IBAN detection with checksum validation — the
    * payment-class sibling of [[piiLuhn]]: candidate tokens, how many
    * pass ISO 13616 mod-97, and the boolean verdict. Whole-stage codegen
    * end to end (higher-order functions over the extracted candidate
    * array, no UDF); per-row narrow, zero shuffles. */
  def piiIban(spark: SparkSession, dir: String): DataFrame = {
    val verdicts = ibanVerdicts("text", spark = true)
    withIbanFixture(Tables.documents(spark, dir)).select(
      col("doc_id"),
      expr(s"size($verdicts)").cast("bigint").as("n_iban"),
      expr(s"size(filter($verdicts, v -> v))").cast("bigint").as("n_iban_valid"))
      .withColumn("has_valid_iban", col("n_iban_valid") > 0)
  }

  def piiIbanSql: String = {
    val verdicts = ibanVerdicts("text", spark = false)
    s"""SELECT doc_id,
       |  len($verdicts) AS n_iban,
       |  len(list_filter($verdicts, v -> v)) AS n_iban_valid,
       |  len(list_filter($verdicts, v -> v)) > 0 AS has_valid_iban
       |FROM (${ibanFixtureSql.replace("\n", "\n  ")}) f""".stripMargin
  }

  /** Per-document span counts by PII class + a has_pii flag. */
  def piiScan(spark: SparkSession, dir: String): DataFrame = {
    val scanned = withPiiFixture(Tables.documents(spark, dir))
      .select(col("doc_id") +: scanColumns(col("text")): _*)
    val total = Classes.map(c => col(s"n_${c._1}")).reduce(_ + _)
    scanned.withColumn("has_pii", total > 0)
  }

  def piiScanSql: String = {
    val counts = Classes.map { case (name, pat, _) =>
      s"len(regexp_extract_all(text, '$pat')) AS n_$name"
    }.mkString(",\n  ")
    val total = Classes.map(c => s"n_${c._1}").mkString(" + ")
    s"""SELECT doc_id, ${Classes.map(c => s"n_${c._1}").mkString(", ")},
       |  ($total) > 0 AS has_pii
       |FROM (
       |  SELECT doc_id,
       |  $counts
       |  FROM (${fixtureSql.replace("\n", "\n  ")}) f) s""".stripMargin
  }

  /** Per-document redacted text twin: every PII span masked with its
    * class token, all other bytes conserved. n_spans is the total masked
    * span count (counted pre-redaction, so the classes don't steal each
    * other's counts). */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val fixture = withPiiFixture(Tables.documents(spark, dir))
    val total = Classes.map(c => col(s"n_${c._1}")).reduce(_ + _)
    fixture
      .select(col("doc_id") +: col("text").as("orig") +: scanColumns(col("text")): _*)
      .select(col("doc_id"),
        redactColumn(col("orig")).as("redacted"),
        total.as("n_spans"))
  }

  def piiRedactSql: String = {
    val counts = Classes.map { case (name, pat, _) =>
      s"len(regexp_extract_all(text, '$pat')) AS n_$name"
    }.mkString(",\n  ")
    val total = Classes.map(c => s"n_${c._1}").mkString(" + ")
    s"""SELECT doc_id, ${redactSqlExpr("text")} AS redacted,
       |  ($total) AS n_spans
       |FROM (
       |  SELECT doc_id, text,
       |  $counts
       |  FROM (${fixtureSql.replace("\n", "\n  ")}) f) s""".stripMargin
  }

  /** Governance audit row per source — the filter_funnel-style rollup a
    * pipeline publishes next to the scrub: how many documents carried
    * PII, per-class span totals, and how many characters the redaction
    * masked (chars of matched spans, BEFORE mask tokens are inserted —
    * i.e. what left the corpus). One partial-agg exchange keyed by
    * source; everything upstream is the narrow per-row scan. */
  def piiAudit(spark: SparkSession, dir: String): DataFrame = {
    val fixture = withPiiFixture(Tables.documents(spark, dir))
    val stripped = Classes.foldLeft(col("text")) { case (acc, (_, pat, _)) =>
      regexp_replace(acc, pat, "")
    }
    val total = Classes.map(c => col(s"n_${c._1}")).reduce(_ + _)
    val aggs: Seq[Column] =
      count(lit(1)).as("n_docs") +:
        sum(when(col("has_pii"), 1L).otherwise(0L)).as("docs_with_pii") +:
        (Classes.map(c => sum(col(s"n_${c._1}")).as(s"n_${c._1}")) :+
          sum(col("masked_chars")).as("masked_chars") :+
          sum(col("chars")).as("total_chars"))
    fixture
      .select(col("source") +: col("doc_id") +:
        (length(col("text")) - length(stripped)).cast("bigint").as("masked_chars") +:
        length(col("text")).cast("bigint").as("chars") +:
        scanColumns(col("text")): _*)
      .withColumn("has_pii", total > 0)
      .groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      // masked_chars ≤ total corpus chars, so at 100 TB the 10⁶ ppm
      // scale-up passes int64 — DECIMAL(38,0) per the module-wide ceiling
      // policy; `div` lowers back to bigint (DuckDB's HUGEINT sum has the
      // same headroom and casts back on its side).
      .withColumn("masked_ppm",
        expr("cast(masked_chars as decimal(38,0)) * 1000000 div total_chars"))
  }

  def piiAuditSql: String = {
    val counts = Classes.map { case (name, pat, _) =>
      s"len(regexp_extract_all(text, '$pat')) AS n_$name"
    }.mkString(",\n  ")
    val stripped = Classes.foldLeft("text") { case (acc, (_, pat, _)) =>
      s"regexp_replace($acc, '$pat', '', 'g')"
    }
    val total = Classes.map(c => s"n_${c._1}").mkString(" + ")
    s"""SELECT source, count(*) AS n_docs,
       |  sum(CASE WHEN $total > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_with_pii,
       |  ${Classes.map(c => s"sum(n_${c._1})::BIGINT AS n_${c._1}").mkString(", ")},
       |  sum(masked_chars)::BIGINT AS masked_chars,
       |  sum(chars)::BIGINT AS total_chars,
       |  (sum(masked_chars) * 1000000 // sum(chars))::BIGINT AS masked_ppm
       |FROM (
       |  SELECT source, doc_id,
       |    length(text) - length($stripped) AS masked_chars,
       |    length(text) AS chars,
       |  $counts
       |  FROM (${fixtureSql.replace("\n", "\n  ")}) f) s
       |GROUP BY source""".stripMargin
  }
}
