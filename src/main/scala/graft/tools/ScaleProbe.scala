package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Caches, SparkEntry}
import graft.plans.GraftSession

/** Empirical scaling probe for the expensive operators: replicate the
  * documents table k× and measure wall time at each k, so the "linear at
  * scale" claims in SCALING.md are measured, not asserted.
  *
  * Replication detail that makes the measurement honest: each replica's
  * tokens are prefixed with a replica tag, so replicas of the same
  * document share NO shingles — the near-dup pair set grows k× (each
  * original pair appears once per replica), not k²× (which replicas that
  * stayed mutual near-dups would produce, polluting the trend with work
  * the real corpus doesn't have). doc_ids are offset per replica; the
  * source column gets a replica suffix so per-source operators keep
  * per-shard cardinality roughly constant.
  *
  * `runMain graft.tools.ScaleProbe [maxK] [sfDir] [outBase]` — times each
  * probe query at k = 1, 2, 4, … ≤ maxK and prints one line per (k, query).
  */
object ScaleProbe {

  private val Probes = Seq("dedup_exact", "dedup_near", "dedup_jaccard",
    "dedup_incremental", "doc_pagerank", "dedup_substring",
    "dedup_substring_pairs", "dedup_substring_winnow", "decontaminate",
    "doc_repetition", "seq_pack", "word_heavy_hitters", "tfidf_top_terms",
    "word_pmi")

  private def replicate(spark: SparkSession, srcDir: String, k: Int, outDir: String): Unit = {
    // the replica tag is a single letter: beyond 26 replicas the tag would
    // leave [a-z] and the letter-run shingle tokenizer would split it off,
    // collapsing the disjoint-shingle-space property the probe depends on
    require(k <= 26, s"ScaleProbe supports at most 26 replicas, got $k")
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    // id offset derived from the corpus, not a literal: a fixed 1e6 stride
    // would silently collide replica ids on corpora with doc_id >= 1e6
    val idStride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val copies = (0 until k).map { r =>
      val tag = s"q${('a' + r).toChar}"
      docs.select(
        (col("doc_id") + lit(r * idStride)).as("doc_id"),
        // per-replica token prefix: replica r's shingle space is disjoint,
        // within-replica Jaccards are untouched (bijective token rename)
        array_join(transform(split(col("text"), " "), t => concat(lit(tag), t)), " ")
          .as("text"),
        col("lang"),
        // replica 0 keeps its source names so the decontaminate benchmark
        // ('src0') persists — fixed eval set against a growing corpus
        (if (r == 0) col("source") else concat(col("source"), lit(s"x$tag"))).as("source"),
        col("n_chars"))
    }
    copies.reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val maxK = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outBase = args.lift(2).getOrElse("/tmp/graft-scaleprobe")
    // optional comma-separated probe filter, e.g. "doc_pagerank,word_pmi"
    val probes = args.lift(3)
      .map(_.split(',').toSeq.map(_.trim).filter(Probes.contains))
      .filter(_.nonEmpty)
      .getOrElse(Probes)
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ks = Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).toSeq
    ks.foreach { k =>
      val dir = s"$outBase/k$k"
      replicate(spark, sfDir, k, dir)
      probes.foreach { name =>
        val fn = SparkEntry.queries(name)
        fn(spark, dir).count() // warm (codegen/JIT for this plan shape)
        Caches.drain()
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Caches.drain()
        println(f"[scaleprobe] k=$k $name%-20s ${sec}%7.2f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
