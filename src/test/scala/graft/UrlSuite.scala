package graft

import org.apache.spark.sql.functions._

import graft.text.UrlQueries

/** URL decomposition contracts: component extraction on the edge cases
  * that break naive parsers, registered-domain widening over the
  * multi-suffix set, and blocklist audit conservation. */
class UrlSuite extends SparkSpec {

  import spark.implicits._

  test("url_parse components on edge-case URLs") {
    val cases = Seq(
      // url -> (scheme, userinfo, host, port, path, query)
      ("https://u7:pw@data.example.co.uk:8443/p/7?ref=rss&s=7",
        ("https", "u7:pw", "data.example.co.uk", "8443", "/p/7", "ref=rss&s=7")),
      ("http://example.org/p/3/index.html",
        ("http", "", "example.org", "", "/p/3/index.html", "")),
      ("https://xn--bcher-kva.de/p/44",
        ("https", "", "xn--bcher-kva.de", "", "/p/44", "")),
      ("ftp+ssh://mirror.example.co.uk/",
        ("ftp+ssh", "", "mirror.example.co.uk", "", "/", "")),
      ("http://cdn.assets.example.net?x=1",
        ("http", "", "cdn.assets.example.net", "", "", "x=1")))
    val got = cases.map(_._1).toDF("url")
      .select(col("url") +: UrlQueries.parseColumns(col("url")): _*)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getString(4),
          r.getString(5), r.getString(6)))).toMap
    cases.foreach { case (u, want) => assert(got(u) == want, s"parse of $u: ${got(u)}") }
  }

  test("registered domain: last-2 labels, widened over the multi-suffix set") {
    val cases = Seq(
      "www.example.com" -> "example.com",
      "blog.example.com" -> "example.com",
      "data.example.co.uk" -> "example.co.uk",
      "mirror.example.co.uk" -> "example.co.uk",
      "example.org" -> "example.org",
      "xn--bcher-kva.de" -> "xn--bcher-kva.de",
      "cdn.assets.example.net" -> "example.net",
      "deep.sub.host.ac.uk" -> "host.ac.uk",
      "localhost" -> "") // single label: empty, grouped not dropped
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), UrlQueries.registeredDomain(col("host")).as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (h, want) => assert(got(h) == want, s"$h -> ${got(h)}") }
  }

  test("rollup conserves the corpus and shares sum to ~one million ppm") {
    val roll = UrlQueries.domainRollup(spark, Sf0001).collect()
    val totalDocs = roll.map(_.getAs[Long]("n_docs")).sum
    val corpus = Tables.documents(spark, Sf0001).count()
    assert(totalDocs == corpus, s"rollup drops docs: $totalDocs != $corpus")
    val shareSum = roll.map(_.getAs[Long]("doc_share_ppm")).sum
    // integer floor division: sum ≤ 10⁶, short by < one ppm per domain
    assert(shareSum <= 1000000L && shareSum > 1000000L - roll.length,
      s"share sum $shareSum")
    // both example.co.uk hosts folded into one registered domain
    assert(roll.count(_.getAs[String]("registered_domain") == "example.co.uk") == 1)
  }

  test("blocklist audit: blocked domains drop everything, others keep everything") {
    val audit = UrlQueries.domainBlocklist(spark, Sf0001).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      val blocked = r.getAs[Boolean]("blocked")
      val n = r.getAs[Long]("n_docs")
      val kept = r.getAs[Long]("n_kept")
      val dropped = r.getAs[Long]("n_dropped")
      assert(kept + dropped == n)
      assert(if (blocked) kept == 0 else dropped == 0)
      assert(blocked == UrlQueries.Blocklist.contains(r.getAs[String]("registered_domain")))
    }
    assert(audit.count(_.getAs[Boolean]("blocked")) == UrlQueries.Blocklist.size)
  }

  test("canonicalization: case/port/fragment/tracking/param-order noise collapses") {
    // four noisy spellings of ONE page must share a canonical key — and a
    // genuinely different page must not
    val variants = Seq(
      "https://WWW.Example.com:443/p/1?utm_source=rss&s=2&utm_medium=feed",
      "https://www.example.com/p/1?s=2&gclid=12345",
      "https://www.example.com/p/1?s=2#frag",
      "https://www.example.com/p/1?s=2",
      "https://www.example.com/p/1?s=3", // different real param
      "http://www.example.com:8080/p/1?s=2") // non-default port kept
    val canon = variants.toDF("url")
      .select(UrlQueries.canonicalColumn("url").as("c"))
      .as[String].collect().toSeq
    assert(canon.take(4).toSet == Set("https://www.example.com/p/1?s=2"))
    assert(canon(4) == "https://www.example.com/p/1?s=3")
    assert(canon(5) == "http://www.example.com:8080/p/1?s=2")
    // registered query properties + the dedup-rate row
    UrlQueries.urlCanonical(spark, Sf0001).collect().foreach { r =>
      val c = r.getAs[String]("canonical_url")
      assert(!c.contains("#") && !c.contains("utm_") && !c.contains("gclid"),
        s"noise survived: $c")
      assert(!c.contains(":443"), s"default port survived: $c")
      val host = c.stripPrefix("https://").takeWhile(_ != '/')
      assert(host == host.toLowerCase, s"host case survived: $c")
    }
    // canonical key count is the designed 3 hosts × 20 paths × 4 params
    // bound; raw URL strings must exceed it for the rate to mean anything
    val stats = UrlQueries.urlDedupRate(spark, Sf0001).head()
    assert(stats.getAs[Long]("n_canonical") <= 240L)
    assert(stats.getAs[Long]("n_urls") > stats.getAs[Long]("n_canonical"))
    assert(stats.getAs[Long]("collapse_ppm") > 0L)
  }

  test("the blocklist join is a broadcast join, corpus side never shuffled against it") {
    val plan = UrlQueries.domainBlocklist(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"blocklist join is not broadcast:\n$plan")
  }
}
