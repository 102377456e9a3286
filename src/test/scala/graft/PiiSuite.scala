package graft

import org.apache.spark.sql.functions._

import graft.text.PiiQueries

/** Span-level contracts of the PII scrub family that the hash-match oracle
  * can't express directly: per-class span determinism on fixed fixtures,
  * and that redaction is byte-conserving outside the matched spans. */
class PiiSuite extends SparkSpec {

  import spark.implicits._

  private val fixtures = Seq(
    // (text, n_email, n_ipv6, n_ipv4, n_phone, n_id)
    ("plain text with no pii at all", 0, 0, 0, 0, 0),
    ("mail a.b_c%d+e@sub.example.org today", 1, 0, 0, 0, 0),
    ("two mails x@y.io and z@w.co", 2, 0, 0, 0, 0),
    ("from 192.168.0.1 and 10.0.0.255", 0, 0, 2, 0, 0),
    ("node 2001:0db8:85a3:0000:0000:8a2e:0370:7334 up", 0, 1, 0, 0, 0),
    ("call +1-555-0142 or +44-201-9999", 0, 0, 0, 2, 0),
    ("ssn-ish 123456789 and id 98765432101", 0, 0, 0, 0, 2),
    // 8-digit run: below the ≥9 id threshold, must NOT match
    ("order 12345678 shipped", 0, 0, 0, 0, 0),
    // scan counts are per-class on the ORIGINAL text: the email's 9-digit
    // local part is counted by BOTH the email and the id class (redaction
    // order, tested below, is what disambiguates the masking)
    ("reach 123456789@example.com", 1, 0, 0, 0, 1))

  test("pii_scan: deterministic per-class span counts on fixed fixtures") {
    val df = fixtures.map(_._1).toDF("text")
      .select(col("text") +: PiiQueries.scanColumns(col("text")): _*)
    val got = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // scanColumns emits Classes order: email, ipv6, ipv4, phone, id
    fixtures.foreach { case (t, e, v6, v4, p, i) =>
      assert(got(t) == ((e.toLong, v6.toLong, v4.toLong, p.toLong, i.toLong)),
        s"span counts for <$t>: ${got(t)}")
    }
  }

  test("pii_redact: masks spans with class tokens, conserves non-PII bytes") {
    val in = Seq(
      "mail x@y.io from 10.0.0.1 call +1-555-0142 ref 123456789 done")
      .toDF("text")
    val out = in.select(PiiQueries.redactColumn(col("text")).as("r"))
      .as[String].head()
    assert(out == "mail [EMAIL] from [IPV4] call [PHONE] ref [ID] done")
    // no-PII text passes through bit-identically
    val clean = "nothing sensitive here, just words and 1234 numbers"
    val same = Seq(clean).toDF("text")
      .select(PiiQueries.redactColumn(col("text")).as("r")).as[String].head()
    assert(same == clean)
  }

  test("pii_redact: class order protects digit runs inside richer spans") {
    // the email local part and the IP octets contain digit runs; the id
    // class must only see what the earlier classes left behind
    val out = Seq("reach 123456789@example.com via 203.0.113.7")
      .toDF("text")
      .select(PiiQueries.redactColumn(col("text")).as("r")).as[String].head()
    assert(out == "reach [EMAIL] via [IPV4]", out)
  }

  test("registered queries are deterministic across invocations") {
    val a = PiiQueries.piiScan(spark, Sf0001).orderBy("doc_id").collect().toSeq
    val b = PiiQueries.piiScan(spark, Sf0001).orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    val r1 = PiiQueries.piiRedact(spark, Sf0001).orderBy("doc_id").collect().toSeq
    val r2 = PiiQueries.piiRedact(spark, Sf0001).orderBy("doc_id").collect().toSeq
    assert(r1 == r2)
  }

  test("hard-negative tail fires nothing in any class") {
    val counts = Seq(PiiQueries.HardNegativeTail).toDF("text")
      .select(PiiQueries.scanColumns(col("text")): _*)
      .collect().head
    (0 until counts.length).foreach(i =>
      assert(counts.getLong(i) == 0L,
        s"hard negative fired class ${PiiQueries.Classes(i)._1}"))
    // and the eval twin reads perfect on the fixture corpus
    val ev = PiiQueries.piiEval(spark, Sf0001)
      .agg(sum("fp"), sum("fn"), min("precision_ppm"), min("recall_ppm")).head()
    assert(ev.getLong(0) == 0 && ev.getLong(1) == 0)
    assert(ev.getLong(2) == 1000000L && ev.getLong(3) == 1000000L)
  }

  test("pii_luhn: in-plan Luhn verdict matches a driver-side reference") {
    def luhnRef(s: String): Boolean = {
      val sum = s.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val dd = d * 2; if (dd > 9) dd - 9 else dd } else d
      }.sum
      sum % 10 == 0
    }
    val pans = Seq("4111111111111111", "4111111111111112", "4222222222222",
      "5500005555555559", "1234567890123", "79927398713")
    // 79927398713 is the canonical Luhn example but only 11 digits — the
    // 13..19 candidate gate must drop it regardless of validity
    val texts = pans.map(p => s"pay $p now")
    val rows = texts.toDF("text")
      .select(col("text"),
        expr("size(" + graft.text.PiiQueries.luhnVerdictsForTest + ")").as("n"),
        expr("size(filter(" + graft.text.PiiQueries.luhnVerdictsForTest + ", v -> v))").as("v"))
      .collect()
    pans.zip(rows).foreach { case (p, r) =>
      val inGate = p.length >= 13 && p.length <= 19
      assert(r.getInt(1) == (if (inGate) 1 else 0), s"$p candidate gate")
      assert(r.getInt(2) == (if (inGate && luhnRef(p)) 1 else 0),
        s"$p: plan verdict != reference Luhn")
    }
  }

  test("pii_iban: in-plan mod-97 verdict matches a BigInteger reference") {
    def ibanRef(s: String): Boolean = {
      val rearranged = s.drop(4) + s.take(4)
      val digits = rearranged.flatMap(c =>
        if (c.isLetter) (c - 'A' + 10).toString else c.toString)
      new java.math.BigInteger(digits)
        .mod(java.math.BigInteger.valueOf(97)) == java.math.BigInteger.ONE
    }
    // the power table the plan folds against IS 10^k mod 97
    graft.text.PiiQueries.Pow97.zipWithIndex.foreach { case (p, k) =>
      assert(java.math.BigInteger.TEN.modPow(
        java.math.BigInteger.valueOf(k), java.math.BigInteger.valueOf(97))
        .intValueExact() == p, s"Pow97($k)")
    }
    val ibans = Seq(
      "GB82WEST12345698765432",  // canonical valid example
      "DE89370400440532013000",  // canonical valid example
      "GB82WEST12345698765433",  // one digit off: invalid
      "MT84MALT011000012345MTLCAST001S", // 31-char, letters in tail
      "NO9386011117947",          // 15-char minimum length
      "GB82WEST123")              // too short: candidate gate must drop
    val rows = ibans.map(i => s"acct $i listed").toDF("text")
      .select(col("text"),
        expr("size(" + graft.text.PiiQueries.ibanVerdictsForTest + ")").as("n"),
        expr("size(filter(" + graft.text.PiiQueries.ibanVerdictsForTest + ", v -> v))").as("v"))
      .collect()
    ibans.zip(rows).foreach { case (i, r) =>
      val inGate = i.length >= 15 && i.length <= 34
      assert(r.getInt(1) == (if (inGate) 1 else 0), s"$i candidate gate")
      assert(r.getInt(2) == (if (inGate && ibanRef(i)) 1 else 0),
        s"$i: plan verdict != reference mod-97")
    }
    // the registered fixture behaves: valid streams flag, invalid stream not
    val q = PiiQueries.piiIban(spark, Sf0001)
    val bad = q.filter(col("doc_id") % 41 === 0 &&
      col("doc_id") % 31 =!= 0 && col("doc_id") % 37 =!= 0)
      .agg(max(col("n_iban")), max(col("n_iban_valid"))).head()
    assert(bad.getLong(0) >= 1L && bad.getLong(1) == 0L,
      "invalid-twin stream must detect candidates but validate none")
    val good = q.filter(col("doc_id") % 31 === 0)
      .agg(min(col("n_iban_valid"))).head().getLong(0)
    assert(good == 1L)
  }

  test("pii_audit reconciles with pii_scan totals") {
    val audit = PiiQueries.piiAudit(spark, Sf0001)
      .agg(sum("docs_with_pii"), sum("n_email"), sum("n_id")).head()
    val scan = PiiQueries.piiScan(spark, Sf0001)
      .agg(sum(when(col("has_pii"), 1L).otherwise(0L)), sum("n_email"), sum("n_id")).head()
    assert(audit == scan, s"audit $audit != scan rollup $scan")
  }
}
