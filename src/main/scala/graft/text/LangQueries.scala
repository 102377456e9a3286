package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Language identification and tokenizer-cost estimation — the remaining
  * text-analysis operators a training-data pipeline runs per document.
  * Everything is per-row (narrow, codegen'd built-ins); nothing shuffles
  * until a downstream aggregate.
  */
object LangQueries {

  /** Stopword profiles per language (function words frequent enough to
    * discriminate). The classifier scores each profile against the
    * document's token set and takes the first maximum in fixed order —
    * deterministic in any engine. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une"))

  /** N-gram/stopword language-ID heuristic: per-language hit counts over the
    * document's tokens, winner-takes-first-max, 'und' (undetermined) when no
    * profile matches. Includes agreement with the labeled `lang` column. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdOn(Tables.documents(spark, dir))

  /** [[langId]] over an arbitrary documents frame: the registered query is
    * a pure per-row projection (no fan-out — an added exchange would be
    * dead weight under a count/limit consumer), while aggregating
    * consumers ([[langIdConfusion]]) pass the spread loader so the
    * profile-scoring work parallelizes on an unsplittable test scan. */
  private def langIdOn(docs: DataFrame): DataFrame = {
    val toks = TextQueries.tokens(col("text"))
    val scored = docs
      .withColumn("toks", toks)
      .select(col("doc_id") +: col("lang") +: Profiles.map { case (l, ws) =>
        val arr = array(ws.map(lit): _*)
        size(filter(col("toks"), t => array_contains(arr, t))).cast("bigint").as(s"s_$l")
      }: _*)
    val best = greatest(Profiles.map { case (l, _) => col(s"s_$l") }: _*)
    val predicted = Profiles.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight + otherwise-chaining means the FIRST profile in order wins
    // ties, matching the SQL CASE below.
    scored
      .withColumn("predicted", predicted)
      .withColumn("agrees", col("predicted") === col("lang"))
  }

  def langIdSql: String = {
    val scoreCols = Profiles.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, t -> list_contains([$list], t))) AS s_$l"
    }.mkString(",\n    ")
    val best = s"greatest(${Profiles.map { case (l, _) => s"s_$l" }.mkString(", ")})"
    val caseArms = Profiles.map { case (l, _) =>
      s"WHEN s_$l = $best AND $best > 0 THEN '$l'"
    }.mkString("\n      ")
    s"""SELECT doc_id, lang, ${Profiles.map { case (l, _) => s"s_$l" }.mkString(", ")},
       |  CASE $caseArms ELSE 'und' END AS predicted,
       |  (CASE $caseArms ELSE 'und' END) = lang AS agrees
       |FROM (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM (SELECT doc_id, lang,
       |          list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '') AS toks
       |        FROM documents) t) s""".stripMargin
  }

  /** Confusion matrix of [[langId]] against the corpus's true labels —
    * the evaluation harness for the engine's OWN classifier (every model
    * operator needs its eval twin): per (true, predicted) cell counts plus
    * the cell's share of its true class in exact ppm (recall on the
    * diagonal, confusion mass off it).
    *
    * Scale shape: [[langId]]'s one narrow scoring pass, then a
    * |langs|²-bounded partial agg; class totals derive from the cells
    * (never a second corpus pass) and attach by broadcast. */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = graft.Caches.persisted(
      langIdOn(Tables.documentsSpread(spark, dir))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n_docs")))
    val totals = cells.groupBy(col("lang")).agg(sum(col("n_docs")).as("n_true"))
    cells.join(broadcast(totals), "lang")
      .select(col("lang"), col("predicted"), col("n_docs"), col("n_true"),
        expr("n_docs * 1000000L div n_true").as("recall_ppm"))
  }

  def langIdConfusionSql: String =
    s"""WITH scored AS ($langIdSql),
       |cells AS (
       |  SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM scored GROUP BY 1, 2),
       |tot AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS n_true FROM cells GROUP BY 1)
       |SELECT cells.lang, predicted, n_docs, n_true,
       |  CAST(n_docs * 1000000 // n_true AS BIGINT) AS recall_ppm
       |FROM cells JOIN tot USING (lang)""".stripMargin

  /** BPE-style pre-tokenization pattern (the GPT-2 shape, simplified to the
    * RE2 subset so any engine can evaluate it). */
  val BpePattern = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Tokenizer cost estimation per document: BPE-ish token count, whitespace
    * token count, bytes per BPE token (the budgeting metric). */
  def tokenCountBpe(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit(BpePattern)).cast("bigint").as("n_bpe_tokens"),
        size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_ws_tokens"),
        octet_length(col("text")).cast("bigint").as("n_bytes"))
      .withColumn("bytes_per_token", col("n_bytes") / col("n_bpe_tokens"))

  def tokenCountBpeSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '${BpePattern.replace("'", "''")}')) AS n_bpe_tokens,
       |  len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens,
       |  octet_length(CAST(text AS BLOB)) AS n_bytes,
       |  octet_length(CAST(text AS BLOB)) / len(regexp_extract_all(text, '${BpePattern.replace("'", "''")}')) AS bytes_per_token
       |FROM documents""".stripMargin

  /** Rolling-hash fingerprint per document (native expression
    * [[graft.functions.RollingHash]]) with a modular bucket for downstream
    * partitioning. */
  def rollingFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        expr("rolling_hash(text)").as("rhash"))
      .withColumn("rbucket", col("rhash") % 64)

  def rollingFingerprintSql: String =
    """SELECT doc_id, rhash, rhash % 64 AS rbucket FROM (
      |  SELECT doc_id,
      |    CASE WHEN length(text) = 0 THEN 0 ELSE
      |      list_reduce(list_transform(range(1, length(text) + 1),
      |                  i -> ord(substr(text, i, 1))::BIGINT),
      |                  (a, c) -> (a * 31 + c) % 2147483647) END AS rhash
      |  FROM documents) t""".stripMargin
}
