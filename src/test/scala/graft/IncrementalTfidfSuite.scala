package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries
import graft.text.TextQueries

/** Engine-internal checks for the round-8 additions: incremental near-dedup
  * ([[DedupQueries.dedupIncremental]]) against the whole-corpus pair set,
  * and TF-IDF top-terms ([[TextQueries.tfidfTopTerms]]) against a
  * driver-side recomputation. The driver's DuckDB oracle remains the
  * authoritative gate; these pin the operator-specific logic (the delivery
  * split, best-match selection, per-doc ranking) cheaply per-commit. */
class IncrementalTfidfSuite extends SparkSpec {

  test("dedup_incremental: consistent with the whole-corpus dedup_near pair set") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val isNew = (id: Long) => id * 5 >= (maxId + 1) * 4

    // Whole-corpus verified pairs, restricted to delivery×index, keyed by
    // the delivery doc → the expected best-match table.
    val spanning = DedupQueries.dedupNear(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        (isNew(a), isNew(b)) match {
          case (false, true) => Some((b, (a, j)))
          case (true, false) => Some((a, (b, j)))
          case _             => None
        }
      }
    val expected = spanning.groupBy(_._1).map { case (id, ms) =>
      id -> ms.map(_._2).minBy { case (m, j) => (-j, m) }
    }

    val got = DedupQueries.dedupIncremental(spark, Sf0001).collect()
    Caches.drain()
    assert(got.length == (0L to maxId).count(isNew), "one row per delivery doc")
    got.foreach { r =>
      val id = r.getLong(0)
      expected.get(id) match {
        case Some((m, j)) =>
          assert(r.getString(3) == "dup_of_index" && r.getLong(1) == m
            && math.abs(r.getDouble(2) - j) < 1e-12,
            s"doc $id: expected best match ($m, $j), got $r")
        case None =>
          assert(r.getString(3) == "novel" && r.isNullAt(1), s"doc $id: phantom match $r")
      }
    }
  }

  test("tfidf_top_terms: per-doc top-3 equals a driver-side recomputation") {
    val scored = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), explode(TextQueries.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = scored.map(_._1).distinct.length
    val dfCount = scored.groupBy(_._2).view.mapValues(_.length).toMap
    val expected = scored
      .map { case (d, t, tf) =>
        (d, t, tf, BigDecimal(tf * math.log(n.toDouble / dfCount(t)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .groupBy(_._1).valuesIterator.flatMap { rows =>
        rows.sortBy { case (_, t, _, s) => (-s, t) }.take(3)
      }.toSet

    val got = TextQueries.tfidfTopTerms(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    Caches.drain()
    assert(got == expected,
      s"diverges: only-spark=${(got -- expected).take(3)} only-oracle=${(expected -- got).take(3)}")
  }

  test("dedup_incremental: probing a parquet-stored LSH index reproduces the inline path") {
    import org.apache.spark.sql.DataFrame
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    def bandsOf(df: DataFrame): DataFrame = DedupQueries.withBandBuckets(
      df.select(col("doc_id"), expr("minhash_sig(text)").as("sig"))
        .filter(size(col("sig")) > 0))
      .select(col("doc_id"), col("band"), col("bh"))

    // the production shape: the index side is a persisted signature table
    val indexDir = java.nio.file.Files.createTempDirectory("lsh-index").toString
    bandsOf(docs.filter(col("doc_id") * 5 < (maxId + 1) * 4))
      .write.mode("overwrite").parquet(indexDir)
    val viaStore = DedupQueries.bestIndexMatches(
        spark.read.parquet(indexDir),
        bandsOf(docs.filter(col("doc_id") * 5 >= (maxId + 1) * 4)),
        docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Caches.drain()

    val inline = DedupQueries.dedupIncremental(spark, Sf0001)
      .filter(col("status") === "dup_of_index")
      .select(col("doc_id"), col("matched_id"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Caches.drain()
    assert(viaStore == inline, s"stored-index probe diverges: $viaStore vs $inline")
  }

  test("doc_pagerank: fixed-point trajectory equals a driver-side replay") {
    val S = 1000000000000L
    val n = spark.read.parquet(s"$Sf0001/documents.parquet").count()
    val ids = (0L until n) // doc_ids are dense 0..n-1 in the fixture
    val pairs = DedupQueries.dedupNear(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = ids.map(i => i -> S / n).toMap
    for (_ <- 1 to 3) {
      val dang = ids.filter(i => !deg.contains(i)).map(rank).sum
      val sums = edges.groupBy(_._2).view
        .mapValues(_.map { case (u, _) => rank(u) / deg(u) }.sum).toMap
      rank = ids.map(i => i -> ((3 * S) / (20 * n) +
        (17 * (sums.getOrElse(i, 0L) + dang / n)) / 20)).toMap
    }
    val expected = rank.toSeq.sortBy { case (i, r) => (-r, i) }.take(20).toSet

    val got = DedupQueries.docPagerank(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.drain()
    assert(got == expected,
      s"diverges: only-spark=${(got -- expected).take(3)} only-oracle=${(expected -- got).take(3)}")
  }

  test("word_pmi: top-100 equals a driver-side recomputation") {
    val toks = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(TextQueries.tokens(org.apache.spark.sql.functions.col("text")).as("toks"))
      .collect().map(_.getSeq[String](0))
    val c1 = toks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c2 = toks.flatMap(t => t.zip(t.drop(1))).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val n1 = c1.values.sum
    val n2 = c2.values.sum
    val expected = c2.toSeq
      .filter { case (_, c) => c >= 5 }
      .map { case ((a, b), c) =>
        val pmi = BigDecimal(math.log((c * n1 * n1).toDouble / (n2 * c1(a) * c1(b))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b, c, pmi)
      }
      .sortBy { case (a, b, _, p) => (-p, a, b) }.take(100).toSet

    val got = TextQueries.wordPmi(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    Caches.drain()
    assert(got == expected,
      s"diverges: only-spark=${(got -- expected).take(3)} only-oracle=${(expected -- got).take(3)}")
  }
}
