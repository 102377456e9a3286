package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Encoding repair / mojibake detection — the ftfy-shaped pass CCNet-class
  * pipelines run before any other text processing: web-crawled corpora are
  * full of UTF-8 text that was decoded as Windows-1252 somewhere upstream
  * ("é" → "Ã©", "’" → "â€™") plus U+FFFD replacement characters from hard
  * decode failures. Reference scope: no analog in the reference engine;
  * part of the LLM-pipeline extension mandated alongside SURVEY.md §2.
  *
  * The repair rule set is DERIVED, not hand-typed: for each curated target
  * character, its mojibake signature is `new String(utf8Bytes(c),
  * "windows-1252")` — the exact string a cp1252 mis-decode produces.
  * Characters whose UTF-8 bytes hit cp1252's five undefined slots (which
  * decode to C1 controls) or NBSP are filtered out programmatically, so
  * every signature is a printable, SQL-literal-safe string. Repair is a
  * chain of LITERAL `replace` calls ordered to be CASCADE-SAFE: longest
  * signatures first, and within a length class any rule whose signature
  * contains another rule's clean char runs BEFORE the rule producing
  * that char. The alphabets are NOT fully disjoint — sig('–') = "â€“"
  * ends in the clean char '“' (cp1252 0x93) — so ordering is load-
  * bearing: were the '“' rule to run first on a dangling "â€" fragment
  * followed by a corrupted '“', it would manufacture sig('–') and a
  * later '–' rule would destroy the just-recovered char. With the
  * constraint ('–' before '“') the manufactured occurrence survives to
  * the output, which IS the correct repair (junk fragment conserved,
  * '“' recovered). One ambiguity is inherent, not fixable by ordering:
  * a raw "â€" fragment immediately followed by a GENUINE clean '“' is
  * byte-identical to a mis-decoded '–', and the chain reads it as the
  * mis-decode — the overwhelmingly more likely event in crawled text.
  * EncodingRepairSuite pins the ordering constraint, the cascade
  * regression case, and the round-trip. The same generated expression
  * string runs verbatim in Spark and DuckDB, so oracle parity is by
  * construction.
  *
  * Scale: per-row narrow projections of codegen'd string built-ins — zero
  * shuffles, column pruning reaches the scan; the rule table is a plan
  * constant, not a join.
  *
  * Fixture note: the synthetic corpus is clean ASCII, so the registered
  * queries compose the operators with [[withMojibake]] — a deterministic
  * doc_id-keyed corruption stage (single-pass per-char forward map, so
  * corrupting cannot cascade) expressed identically in both engines via
  * interpolated constants. The operators themselves take any text column. */
object EncodingRepair {

  /** Curated repair targets: Latin-1/Latin-Extended letters and the
    * Windows punctuation block commonly seen double-encoded. '”' (U+201D)
    * is intentionally absent — its UTF-8 tail byte 0x9D is undefined in
    * cp1252, so real-world mis-decodes of it lose information and are not
    * literal-reversible. */
  private val TargetChars = "éèêëîïôöûüçñáíóú’‘“–—…"

  /** (signature, clean) pairs in REPAIR ORDER: longest signature first,
    * and within a length class, rules whose signature contains another
    * rule's clean char run first (the cascade-safety constraint — see the
    * object doc; today the only such containment is '“' at sig('–')[2]).
    * Derived from [[TargetChars]]; filtered so no signature carries a C1
    * control (cp1252-undefined byte) or NBSP. */
  val Signatures: Seq[(String, String)] = {
    val derived = TargetChars.map { c =>
      (new String(c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        "windows-1252"), c.toString)
    }.filter { case (sig, _) =>
      // U+0080-U+009F: cp1252-undefined bytes decode to C1 controls;
      // U+00A0: NBSP - both unfit for SQL literals / CSV round-trips.
      sig.forall(ch => ch < 0x0080 || ch > 0x00a0)
    }
    val cleans = derived.map(_._2.head).toSet
    // sortBy is stable: within (length, constraint-class) the TargetChars
    // order is preserved. Rules whose signature embeds a clean char sort
    // ahead of their length class so they consume their span before any
    // rule can produce that char next to a dangling fragment.
    derived.sortBy { case (sig, clean) =>
      (-sig.length, if (sig.exists(ch => ch != clean.head && cleans.contains(ch))) 0 else 1)
    }
  }

  private val SigOf: Map[Char, String] =
    Signatures.map { case (sig, clean) => clean.head -> sig }.toMap

  /** Clean fixture tail: every repairable character once, space-separated
    * (the spaces also rule out any cross-signature junction ambiguity in
    * the corrupted form). */
  val CleanTail: String =
    " fixture: " + Signatures.map(_._2).mkString(" ") + " end."

  /** [[CleanTail]] through the forward (corrupting) map — one pass over
    * characters, so a produced signature can never be re-corrupted by a
    * later rule. */
  val CorruptTail: String =
    CleanTail.map(c => SigOf.getOrElse(c, c.toString)).mkString

  /** The chained literal-replace repair over SQL expression `inner` — the
    * SAME string parses in Spark and DuckDB. */
  def repairExpr(inner: String): String =
    Signatures.foldLeft(inner) { case (acc, (sig, clean)) =>
      s"replace($acc, '$sig', '$clean')"
    }

  /** Total signature occurrences in `t` via length arithmetic
    * (`divOp` = "div" for Spark, "//" for DuckDB). Each term is exact:
    * removal shrinks the string by occurrences × |sig| characters. */
  def sigCountExpr(t: String, divOp: String): String =
    Signatures.map { case (sig, _) =>
      s"((length($t) - length(replace($t, '$sig', ''))) $divOp ${sig.length})"
    }.mkString("(", " + ", ")")

  /** Characters covered by signatures (for density scoring). */
  private def sigCharsExpr(t: String): String =
    Signatures.map { case (sig, _) =>
      s"(length($t) - length(replace($t, '$sig', '')))"
    }.mkString("(", " + ", ")")

  private val Fffd = "�"

  /** Deterministic corruption over the clean synthetic corpus: mojibake
    * tail on the 4-residue stream, U+FFFD damage on the 17-residue
    * stream, and an ALREADY-CLEAN unicode tail on the 9-residue stream
    * (which the scorer must not flag and the repair must not touch). */
  def withMojibake(docs: DataFrame): DataFrame = docs.withColumn("text",
    concat(col("text"),
      when(col("doc_id") % 4 === 0, lit(CorruptTail)).otherwise(lit("")),
      when(col("doc_id") % 9 === 0, lit(CleanTail)).otherwise(lit("")),
      when(col("doc_id") % 17 === 0, lit(s" data $Fffd$Fffd lost.")).otherwise(lit(""))))

  /** The same corruption in DuckDB SQL. */
  def fixtureSql: String =
    // NOTE: no line here may START with '|' — the consumer SQL builders
    // run stripMargin AFTER interpolating this block, which would eat one
    // pipe of a leading '||'.
    s"""SELECT doc_id, text ||
       |  CASE WHEN doc_id % 4 = 0 THEN '$CorruptTail' ELSE '' END ||
       |  CASE WHEN doc_id % 9 = 0 THEN '$CleanTail' ELSE '' END ||
       |  CASE WHEN doc_id % 17 = 0 THEN ' data $Fffd$Fffd lost.' ELSE '' END
       |  AS text
       |FROM documents""".stripMargin

  /** The per-row diagnosis columns over a text column named `t` —
    * shared by the batch query and the streaming twin
    * ([[graft.streaming.StreamingCorpus.mojibakeScore]]), so parity is
    * by construction: signature occurrence count, replacement-character
    * count, affected-character density in ppm. All per-row int64
    * arithmetic (a single document would need > 9·10¹² characters to
    * stress the ppm multiply). */
  def scoreColumns(t: String): Seq[Column] = Seq(
    expr(sigCountExpr(t, "div")).as("n_sig"),
    expr(s"length($t) - length(replace($t, '$Fffd', ''))")
      .cast("bigint").as("n_repl"),
    // Spark length() is int32 — widen to bigint BEFORE the 10⁶ multiply
    // (DuckDB's length() is already BIGINT on its side).
    expr(s"cast(${sigCharsExpr(t)} + length($t)" +
      s" - length(replace($t, '$Fffd', '')) as bigint) * 1000000 div length($t)")
      .as("mojibake_ppm"))

  /** Per-document mojibake diagnosis over the fixture corpus, plus the
    * boolean verdict. */
  def mojibakeScore(spark: SparkSession, dir: String): DataFrame =
    withMojibake(Tables.documents(spark, dir))
      .select(col("doc_id") +: scoreColumns("text"): _*)
      .withColumn("is_mojibake", col("n_sig") + col("n_repl") > 0)

  def mojibakeScoreSql: String =
    s"""SELECT doc_id,
       |  ${sigCountExpr("text", "//")} AS n_sig,
       |  length(text) - length(replace(text, '$Fffd', '')) AS n_repl,
       |  (${sigCharsExpr("text")} + length(text)
       |     - length(replace(text, '$Fffd', ''))) * 1000000 // length(text) AS mojibake_ppm,
       |  (${sigCountExpr("text", "//")}
       |     + length(text) - length(replace(text, '$Fffd', ''))) > 0 AS is_mojibake
       |FROM (${fixtureSql.replace("\n", "\n  ")}) f""".stripMargin

  /** Eval twin (the pii_eval pattern): the scorer's per-document verdict
    * against the fixture's residue-stream ground truth — a doc is
    * truly-corrupt iff it sits on the 4-residue (signatures) or
    * 17-residue (U+FFFD damage) stream. TP/FP/FN + exact-ppm
    * precision/recall in one scan + one 1-row aggregate; the clean-unicode
    * 9-residue stream is the hard negative the scorer must not flag. */
  def mojibakeEval(spark: SparkSession, dir: String): DataFrame =
    withMojibake(Tables.documents(spark, dir)).select(
      ((expr(sigCountExpr("text", "div")) +
        expr(s"length(text) - length(replace(text, '$Fffd', ''))")) > 0).as("det"),
      (col("doc_id") % 4 === 0 || col("doc_id") % 17 === 0).as("exp"))
      .agg(
        sum(when(col("det") && col("exp"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("det") && !col("exp"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("det") && col("exp"), 1L).otherwise(0L)).as("fn"),
        count(lit(1)).as("n_docs"))
      .withColumn("precision_ppm",
        expr("cast(tp as decimal(38,0)) * 1000000 div (tp + fp)"))
      .withColumn("recall_ppm",
        expr("cast(tp as decimal(38,0)) * 1000000 div (tp + fn)"))

  def mojibakeEvalSql: String =
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
       |  SELECT (${sigCountExpr("text", "//")}
       |      + length(text) - length(replace(text, '$Fffd', ''))) > 0 AS det,
       |    (doc_id % 4 = 0 OR doc_id % 17 = 0) AS exp
       |  FROM (${fixtureSql.replace("\n", "\n  ")}) f) s""".stripMargin

  /** Repaired-text twin: every signature reversed to its character,
    * U+FFFD left in place (a hard decode failure is unrecoverable — a
    * repair pass must not pretend otherwise), all other bytes conserved. */
  def encodingRepair(spark: SparkSession, dir: String): DataFrame =
    withMojibake(Tables.documents(spark, dir)).select(
      col("doc_id"),
      expr(repairExpr("text")).as("repaired"),
      expr(sigCountExpr("text", "div")).as("n_fixed"))
      .withColumn("changed", col("n_fixed") > 0)

  def encodingRepairSql: String =
    s"""SELECT doc_id, ${repairExpr("text")} AS repaired,
       |  ${sigCountExpr("text", "//")} AS n_fixed,
       |  ${sigCountExpr("text", "//")} > 0 AS changed
       |FROM (${fixtureSql.replace("\n", "\n  ")}) f""".stripMargin
}
