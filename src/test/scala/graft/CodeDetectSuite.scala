package graft

import org.apache.spark.sql.functions._

import graft.text.CodeDetect

/** Detector contracts: signal exactness on controlled strings, threshold
  * separation on both fixture sides (dense code above, keyword-bearing
  * prose below), and the eval twin's ground-truth read. */
class CodeDetectSuite extends SparkSpec {

  import spark.implicits._

  private def detect(texts: Seq[String]) =
    texts.toDF("text")
      .select(col("text") +: length(col("text")).cast("bigint").as("n_chars") +:
        CodeDetect.signalColumns(col("text")): _*)
      .withColumn("score_ppm", CodeDetect.scoreColumn)
      .withColumn("is_code", col("score_ppm") >= CodeDetect.ThresholdPpm)
      .collect()

  test("signals are exact counts on controlled strings") {
    val r = detect(Seq("var x = 1; if (x) { return (x + 1); } let y;")).head
    assert(r.getAs[Long]("n_braces") == 2)
    assert(r.getAs[Long]("n_semis") == 3)
    assert(r.getAs[Long]("n_parens") == 4)
    assert(r.getAs[Long]("n_assign") == 1)
    // var, return, let — `if` is deliberately not a keyword (common prose)
    assert(r.getAs[Long]("n_keywords") == 3)
  }

  test("keywords are word-bounded and case-sensitive") {
    val r = detect(Seq("variance returns functions Let Var IMPORT deflect")).head
    assert(r.getAs[Long]("n_keywords") == 0,
      "substrings / capitalized words must not count")
  }

  test("threshold separates dense code from keyword-bearing prose") {
    val code = "function f(x) { var a = 0; for (var i = 0; i < x; i = i + 1)" +
      " { a = a + i; } return a; }"
    val prose = "The function of criticism, as she would return to it, was to" +
      " let the work import its own terms."
    val negative = CodeDetect.HardNegative
    val rows = detect(Seq(code, prose, negative))
    assert(rows(0).getAs[Boolean]("is_code"), s"code scored ${rows(0).getAs[Long]("score_ppm")}")
    assert(!rows(1).getAs[Boolean]("is_code"), s"prose scored ${rows(1).getAs[Long]("score_ppm")}")
    assert(!rows(2).getAs[Boolean]("is_code"), s"hard negative scored ${rows(2).getAs[Long]("score_ppm")}")
  }

  test("fixture ground truth: eval reads perfect precision/recall") {
    val ev = CodeDetect.codeEval(spark, Sf0001).head()
    assert(ev.getAs[Long]("n_docs") > 0)
    assert(ev.getAs[Long]("fp") == 0, s"false positives: $ev")
    assert(ev.getAs[Long]("fn") == 0, s"false negatives: $ev")
    assert(ev.getAs[Long]("precision_ppm") == 1000000L)
    assert(ev.getAs[Long]("recall_ppm") == 1000000L)
  }

  test("score is integer ppm, zero for clean prose, monotone in snippet mass") {
    val rows = detect(Seq(
      "just plain words with no punctuation at all",
      "a tiny bit; of punctuation (once)",
      "x = 1; y = 2; { (a); (b); } { (c); } var q; let r; const s;"))
    val scores = rows.map(_.getAs[Long]("score_ppm"))
    assert(scores(0) == 0L)
    assert(scores(0) < scores(1) && scores(1) < scores(2))
  }
}
