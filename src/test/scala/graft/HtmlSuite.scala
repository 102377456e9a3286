package graft

import org.apache.spark.sql.functions._

import graft.text.HtmlQueries

/** Extraction contracts the hash-match oracle can't see (both engines
  * share the rule semantics by construction): block content never
  * survives, conservation/subsequence of plain text, entity-decode
  * ordering, and the fixture streams' ground truth. */
class HtmlSuite extends SparkSpec {

  import spark.implicits._

  private def extract(texts: Seq[String]): Seq[String] =
    texts.toDF("text")
      .select(HtmlQueries.extractColumn(col("text")).as("r"))
      .as[String].collect().toSeq

  test("script/style/comment content never survives — adversarial shapes") {
    val cases = Seq(
      // attribute carrying '>' inside quotes is NOT handled by rule-based
      // strippers (documented); these stay within the supported grammar:
      "<script>var a = 1; leak1()</script>keep",
      "<SCRIPT TYPE=\"text/javascript\">LEAK2</SCRIPT>keep",
      "<script src=\"x.js\" async>if (a < b) { leak3(); }</script>keep",
      "<style>.x { color: red } /* leak4 */</style>keep",
      "<STYLE media=print>leak5</STYLE>keep",
      "<!-- leak6 --><p>keep</p>",
      "<!-- multi\nline\nleak7 -->keep",
      "<script>\nmulti\nline leak8\n</script>keep")
    val out = extract(cases)
    out.zipWithIndex.foreach { case (o, i) =>
      assert(o == "keep", s"case $i extracted <$o>")
    }
  }

  test("inner text of structural tags survives; plain text is conserved") {
    assert(extract(Seq(
      "<html><body><h1>Title</h1><p>one <b>two</b> three</p></body></html>",
      "no markup at all",
      "spaced   out\ttext")) ==
      Seq("Title one two three", "no markup at all", "spaced out text"))
  }

  test("entity decode order: tags first, &amp; last") {
    // &lt;script&gt; is TEXT, not markup — decoding before tag-stripping
    // would delete it; and &amp;lt; must yield the literal string &lt;
    assert(extract(Seq(
      "<p>&lt;script&gt;not code&lt;/script&gt;</p>",
      "a &amp;lt; b",
      "Tom &amp; Jerry &quot;q&quot; &#39;s&#39;&nbsp;end")) ==
      Seq("<script>not code</script>", "a &lt; b", "Tom & Jerry \"q\" 's' end"))
  }

  test("extracted non-space chars are a subsequence of the input (entity-free)") {
    val cases = Seq(
      "<html><head><title>T</title></head><body><p>a b</p><div>c</div></body></html>",
      "<ul><li>x1</li><li>x2</li></ul> tail",
      "plain words only")
    def isSubseq(small: String, big: String): Boolean = {
      var i = 0
      big.foreach(ch => if (i < small.length && small(i) == ch) i += 1)
      i == small.length
    }
    cases.zip(extract(cases)).foreach { case (in, out) =>
      assert(isSubseq(out.replace(" ", ""), in.replace(" ", "").replace("\n", "")),
        s"<$out> not a subsequence of <$in>")
    }
  }

  test("fixture ground truth: eval reads exact on every doc, zero leaks") {
    val ev = HtmlQueries.htmlEval(spark, Sf0001).head()
    val n = ev.getAs[Long]("n_docs")
    assert(n > 0)
    assert(ev.getAs[Long]("n_exact") == n, s"only ${ev.getAs[Long]("n_exact")}/$n exact")
    assert(ev.getAs[Long]("script_leaks") == 0)
    assert(ev.getAs[Long]("style_leaks") == 0)
    assert(ev.getAs[Long]("comment_leaks") == 0)
    // decimal `div` lowers to bigint (the module-wide ceiling policy)
    assert(ev.getAs[Long]("exact_ppm") == 1000000L)
  }

  test("link extraction: absolute hrefs only, canonical in-degree collapses noise") {
    val links = HtmlQueries.htmlLinks(spark, Sf0001).collect()
    assert(links.nonEmpty)
    links.foreach { r =>
      assert(r.getAs[String]("link").matches("^https?://.*"),
        s"relative link leaked: ${r.getAs[String]("link")}")
      val c = r.getAs[String]("canonical_link")
      assert(!c.contains("utm_"), s"tracking survived canonicalization: $c")
      val host = c.stripPrefix("https://").takeWhile(_ != '/')
      assert(host == host.toLowerCase, s"host case survived: $c")
    }
    // the 9-stream's relative link must be dropped, not mangled: total
    // links = one per doc + one per 4-stream doc, nothing else
    val nDocs = Tables.documents(spark, Sf0001).count()
    val n4 = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % 4 === 0).count()
    assert(links.length == (nDocs + n4),
      s"${links.length} links for $nDocs docs + $n4 noisy anchors")
    // canonical target space is the designed 3 hosts × 10 paths bound
    val deg = HtmlQueries.linkIndegree(spark, Sf0001).collect()
    assert(deg.length <= 30, s"${deg.length} canonical targets")
    assert(deg.map(_.getAs[Long]("n_refs")).sum == links.length)
  }

  test("boilerplate_ppm is exact length arithmetic and bounded") {
    val rows = HtmlQueries.boilerplateRate(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val html = r.getAs[Long]("n_chars_html")
      val text = r.getAs[Long]("n_chars_text")
      val ppm = r.getAs[Long]("boilerplate_ppm")
      assert(text <= html)
      assert(ppm == (html - text) * 1000000L / html)
      assert(ppm >= 0 && ppm <= 1000000L)
    }
  }
}
