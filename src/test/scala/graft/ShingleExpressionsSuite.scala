package graft

import org.apache.spark.sql.functions._

import graft.functions.{MinHashSig, ShingleExpressions}

/** Unit + integration coverage for the native dedup expressions. */
class ShingleExpressionsSuite extends SparkSpec {

  test("shingles: distinct 3-grams over letter-run tokens") {
    val s = ShingleExpressions.shingles("the quick fox, the quick fox jumps!")
    assert(s == collection.mutable.LinkedHashSet(
      "the quick fox", "quick fox the", "fox the quick", "quick fox jumps"))
    assert(ShingleExpressions.shingles("one two").isEmpty)
    assert(ShingleExpressions.shingles("").isEmpty)
  }

  test("tokenization matches the \\p{L} spec incl. non-ASCII letters") {
    val s = ShingleExpressions.shingles("naïve Ärger 42 œuf deux-points")
    assert(s.head == "naïve Ärger œuf")
  }

  test("hash64 is deterministic and well-spread") {
    val hs = (1 to 1000).map(i => ShingleExpressions.hash64(s"shingle $i"))
    assert(hs.distinct.size == 1000)
    assert(ShingleExpressions.hash64("abc") == ShingleExpressions.hash64("abc"))
  }

  test("minhash_sig SQL function: 64 longs, equal texts ⇒ equal signatures") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words entirely here")
    ).toDF("id", "text").select(col("id"), expr("minhash_sig(text)").as("sig"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).length == MinHashSig.NumHashes)
    assert(rows(1L) == rows(2L))
    assert(rows(1L) != rows(3L))
  }

  test("minhash collision rate tracks Jaccard similarity") {
    import spark.implicits._
    // letter-only words (digits are token separators per the \p{L} spec)
    def w(i: Int) = s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val base = (1 to 40).map(w).mkString(" ")
    val similar = (1 to 38).map(w).mkString(" ") + " xq xz" // high overlap
    val df = Seq((1L, base), (2L, similar)).toDF("id", "text")
      .select(col("id"), expr("minhash_sig(text)").as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree = m(1L).zip(m(2L)).count { case (a, b) => a == b }
    // true 3-gram jaccard ≈ 36/44 ≈ 0.82 → expect roughly that fraction of
    // the 64 hashes to agree; allow a generous band
    assert(agree > 32 && agree < 64, s"agree=$agree")
  }

  test("shingle_set SQL function round-trips") {
    import spark.implicits._
    val got = Seq("a b c d").toDF("text")
      .select(expr("shingle_set(text)").as("s"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a b c", "b c d"))
  }

  test("null inputs propagate as null through every native function") {
    val row = spark.sql(
      """SELECT minhash_sig(CAST(NULL AS STRING)) IS NULL AS a,
        |       shingle_set(CAST(NULL AS STRING)) IS NULL AS b,
        |       cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) IS NULL AS c,
        |       cosine_sim(array(1.0D, 2.0D), array(1.0D)) IS NULL AS d,
        |       cosine_sim(array(0.0D, 0.0D), array(1.0D, 1.0D)) IS NULL AS e,
        |       rh_sig(CAST(NULL AS ARRAY<DOUBLE>)) IS NULL AS f,
        |       rolling_hash(CAST(NULL AS STRING)) IS NULL AS g""".stripMargin).collect()(0)
    (0 until 7).foreach(i => assert(row.getBoolean(i), s"column $i"))
  }

  test("empty/short documents yield empty signatures, not nulls") {
    import spark.implicits._
    val df = Seq("", "one", "one two").toDF("text")
      .select(expr("minhash_sig(text)").as("sig"), expr("shingle_set(text)").as("s"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0).isEmpty)
      assert(r.getSeq[String](1).isEmpty)
    }
  }

  test("native simhash_sig equals the two-phase aggregate formulation") {
    for (hexDigits <- Seq(4, 15)) {
      val twoPhase = graft.dedup.DedupQueries.simhashN(spark, Sf0001, hexDigits)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val native = Tables.documents(spark, Sf0001)
        .select(col("doc_id"), expr(s"simhash_sig(text, $hexDigits)").as("s"))
        .filter(col("s").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native == twoPhase, s"hexDigits=$hexDigits")
    }
  }

  test("scalar native expressions compile under forced codegen (no silent fallback)") {
    // Spark silently falls back to interpreted eval when generated code
    // fails to compile — which would mask a broken doGenCode while every
    // value test stays green. Force codegen-or-throw and exercise all four
    // scalar kernels, including their value-dependent null paths.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = spark.sql(
        """SELECT simhash_sig('one two one', 15) AS a,
          |       simhash_sig('123 456', 15) AS a_null,
          |       rolling_hash('abc') AS b,
          |       rh_sig(array(1.0D, -1.0D)) AS c,
          |       cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS d,
          |       cosine_sim(array(0.0D), array(1.0D)) AS d_null""".stripMargin).collect()(0)
      assert(!r.isNullAt(0))
      assert(r.isNullAt(1)) // tokenless → null through the generated path
      assert(r.getLong(2) == (("a".codePointAt(0) * 31L + 'b'.toInt) * 31 + 'c'.toInt) % 2147483647L)
      assert(r.getDouble(4) == 1.0)
      assert(r.isNullAt(5)) // zero norm → null through the generated path
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("simhash_sig rejects bad nHexDigits at analysis, not per-row") {
    import spark.implicits._
    // Out-of-range literal: must throw when the plan is analyzed (collect on
    // a lazy DataFrame), with the analysis-time message, before any row runs.
    val outOfRange = intercept[Exception] {
      spark.sql("SELECT simhash_sig('one two three', 16)").collect()
    }
    assert(outOfRange.getMessage.contains("nHexDigits must be in [1, 15]"),
      outOfRange.getMessage)
    // Column-valued (non-foldable) width: same — analysis failure, even
    // though every row's value would individually be in range.
    val nonFoldable = intercept[Exception] {
      Seq(("one two three", 4)).toDF("text", "n")
        .selectExpr("simhash_sig(text, n)").collect()
    }
    assert(nonFoldable.getMessage.contains("foldable int literal"),
      nonFoldable.getMessage)
  }

  test("simhash_sig is null only for tokenless documents") {
    import spark.implicits._
    val rows = Seq("", "123 456", "one two one").toDF("text")
      .select(expr("simhash_sig(text, 15)").as("s")).collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0) && !rows(2).isNullAt(0))
  }
}
