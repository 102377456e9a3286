package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.text.EncodingRepair

/** Round-trip and derivation contracts of the mojibake repair rules — the
  * properties the hash-match oracle can't see because both engines share
  * the generated expression strings. */
class EncodingRepairSuite extends SparkSpec {

  import spark.implicits._

  test("signature table derivation: cp1252 mis-decode of each target's UTF-8") {
    assert(EncodingRepair.Signatures.nonEmpty)
    EncodingRepair.Signatures.foreach { case (sig, clean) =>
      assert(clean.length == 1)
      assert(sig == new String(clean.getBytes(UTF_8), "windows-1252"),
        s"signature of <$clean> is not its cp1252 mis-decode")
      assert(sig.length == clean.getBytes(UTF_8).length,
        s"signature of <$clean> lost bytes in cp1252 — filter should have dropped it")
      // SQL-literal safety: no quotes, no C1 controls, no NBSP
      assert(!sig.contains('\'') && sig.forall(ch => ch < 0x0080 || ch > 0x00a0))
    }
    // longest-first ordering (3-byte before 2-byte signatures)
    val lens = EncodingRepair.Signatures.map(_._1.length)
    assert(lens == lens.sorted.reverse)
    // cascade-safety ordering: wherever a signature contains ANOTHER
    // rule's clean char at ANY position (full containment scan, not just
    // the anchor char — sig('–') embeds '“' at position 2), the
    // containing rule must run BEFORE the rule producing that char, so a
    // manufactured occurrence can never be destroyed by a later rule.
    val sigs = EncodingRepair.Signatures
    val idxOfClean = sigs.map(_._2.head).zipWithIndex.toMap
    val containments = for {
      ((sig, clean), i) <- sigs.zipWithIndex
      ch <- sig.toSet if ch != clean.head && idxOfClean.contains(ch)
    } yield (i, idxOfClean(ch), clean, ch)
    containments.foreach { case (i, j, clean, ch) =>
      assert(i < j, s"rule <$clean> (sig contains clean <$ch>) must run before rule <$ch>")
    }
    // the constraint is exercised, not vacuous: the '–'/'“' containment
    // the ordering exists for is present in the derived table
    assert(containments.exists { case (_, _, c, ch) => c == "–" && ch == '“' })
  }

  test("cascade regression: dangling fragment + corrupted '“' repairs without destroying the recovered char") {
    val sigQuote = EncodingRepair.Signatures.collectFirst { case (s, "“") => s }.get
    val sigDash = EncodingRepair.Signatures.collectFirst { case (s, "–") => s }.get
    // a '”' (or any 0x9D-tailed char) mis-decode drops its last byte,
    // leaving the dangling 2-char fragment that prefixes the 3-byte sigs
    val fragment = sigDash.take(2) // "â€"
    val input = fragment + sigQuote
    val out = Seq(input).toDF("text")
      .select(expr(EncodingRepair.repairExpr("text")).as("r"))
      .as[String].head()
    // correct repair: fragment conserved, '“' recovered. The output is
    // byte-identical to sig('–') — the inherent ambiguity the object doc
    // records — but here it MUST be produced by the '“' rule AFTER the
    // '–' rule already ran, i.e. it must survive to the output.
    assert(out == fragment + "“", s"cascade destroyed the recovered char: <$out>")
    // and a genuine mis-decoded '–' still repairs to '–'
    val dash = Seq(sigDash).toDF("text")
      .select(expr(EncodingRepair.repairExpr("text")).as("r"))
      .as[String].head()
    assert(dash == "–")
  }

  test("known mojibake strings round-trip to clean text through the repair") {
    val cases = Seq(
      // classic double-encodings, written as their clean forms and
      // corrupted through the same forward map the fixture uses
      "café", "résumé", "naïve", "déjà-less crème brûlée", // é è î ï û ü …
      "‘quoted’ text – en dash — em dash … ellipsis",
      EncodingRepair.CleanTail)
    val corrupt = cases.map(s =>
      s.map(c => EncodingRepair.Signatures.collectFirst {
        case (sig, clean) if clean.head == c => sig
      }.getOrElse(c.toString)).mkString)
    val repaired = corrupt.toDF("text")
      .select(expr(EncodingRepair.repairExpr("text")).as("r"))
      .as[String].collect().toSeq
    assert(repaired == cases, s"round-trip failed: $repaired")
  }

  test("repair conserves clean text (including clean unicode) bit-identically") {
    val clean = Seq("plain ascii text", EncodingRepair.CleanTail,
      "mixed clean é and ascii", "data � kept")
    val out = clean.toDF("text")
      .select(expr(EncodingRepair.repairExpr("text")).as("r"))
      .as[String].collect().toSeq
    assert(out == clean)
  }

  test("sig count arithmetic matches an independent occurrence count") {
    val samples = Seq(EncodingRepair.CorruptTail,
      EncodingRepair.CorruptTail + EncodingRepair.CorruptTail,
      "no mojibake at all", EncodingRepair.CleanTail)
    val got = samples.toDF("text")
      .select(expr(EncodingRepair.sigCountExpr("text", "div")).as("n"))
      .as[Long].collect().toSeq
    val want = samples.map(s => EncodingRepair.Signatures.map { case (sig, _) =>
      var c = 0; var i = s.indexOf(sig)
      while (i >= 0) { c += 1; i = s.indexOf(sig, i + sig.length) }
      c.toLong
    }.sum)
    assert(got == want)
    assert(want.head == EncodingRepair.Signatures.size.toLong,
      "CorruptTail must exercise every signature exactly once")
  }

  test("registered fixture streams behave: corrupt flagged, clean and damaged classified") {
    val scored = graft.text.EncodingRepair.mojibakeScore(spark, Sf0001)
    // 4-residue docs carry signatures; 9-residue-only docs must NOT flag
    val bad = scored.filter(col("doc_id") % 4 === 0)
      .agg(min(col("n_sig"))).head().getLong(0)
    assert(bad == EncodingRepair.Signatures.size.toLong)
    val cleanUnicode = scored.filter(col("doc_id") % 4 =!= 0 &&
      col("doc_id") % 17 =!= 0 && col("doc_id") % 9 === 0)
      .agg(max(col("n_sig")), max(col("n_repl"))).head()
    assert(cleanUnicode.getLong(0) == 0 && cleanUnicode.getLong(1) == 0)
    val damaged = scored.filter(col("doc_id") % 17 === 0 && col("doc_id") % 4 =!= 0)
      .agg(min(col("n_repl"))).head().getLong(0)
    assert(damaged == 2L)
    // full-corpus repair round-trip: repairing the corrupted corpus and
    // re-corrupting the repaired tails is identity on the fixture stream
    val rep = graft.text.EncodingRepair.encodingRepair(spark, Sf0001)
    val residue = rep.select(
      expr(EncodingRepair.sigCountExpr("repaired", "div")).as("left"))
      .agg(max(col("left"))).head().getLong(0)
    assert(residue == 0L, "repair left signatures behind")
  }
}
