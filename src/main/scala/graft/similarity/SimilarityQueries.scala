package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.VectorExpressions

/** Similarity search over the `embeddings` table (`ArrayType(FloatType)`,
  * dim 64).
  *
  * Two paths, as a 100 TB design requires:
  *  - [[topkBruteForce]] — the exactness baseline: a small query set is
  *    broadcast against the full corpus (one narrow pass over the big side,
  *    no shuffle of the corpus), cosine in codegen'd higher-order functions,
  *    per-query top-k via window rank. Cost is O(|corpus|·|queries|); correct
  *    whenever the query set is small.
  *  - [[topkLsh]] — the scale path: random-hyperplane signatures bucket the
  *    corpus; each query only scores its own bucket (plus 1-bit multiprobe
  *    neighbors). Candidate generation is an equi-join on the signature, so
  *    the corpus is scanned once and shuffled by an 8-bit key — never an
  *    all-pairs product.
  *
  * All float vectors are cast to double before arithmetic and folds run
  * strictly left-to-right (`aggregate`), so cosine values are bit-identical
  * to any engine doing the same ordered fold — which the DuckDB oracle does.
  */
object SimilarityQueries {

  private val NumQueries = 5
  private val K = 10

  /** Exact cosine top-k for query vectors vec_id < 5 against the corpus.
    * `cosine_sim` ([[graft.functions.CosineSim]]) folds in index order, so
    * the value is bit-identical to the oracle's ordered fold. */
  def topkBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = base
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val scored = base.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", expr("cosine_sim(qe, e)"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id"), col("rank").cast("bigint").as("rank"), col("cosine"))
  }

  def topkBruteForceSql: String =
    s"""WITH n AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS e,
       |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (a, x) -> a + x) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM n WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT q_id, b.vec_id AS vec_id,
       |    list_reduce(list_transform(range(1, len(qe) + 1), i -> qe[i] * b.e[i]), (a, x) -> a + x)
       |      / (sqrt(qn) * sqrt(b.nrm)) AS cosine
       |  FROM q, n b WHERE b.vec_id <> q_id)
       |SELECT q_id, vec_id, rank, cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored) r
       |WHERE rank <= $K""".stripMargin

  /** Approximate top-k: score only corpus vectors whose 8-bit
    * random-hyperplane signature ([[graft.functions.RandomHyperplaneSig]])
    * matches the query's bucket or any 1-bit flip of it (multiprobe).
    * Candidate generation is an equi-join on the signature — the corpus is
    * scanned once, shuffled by an 8-bit key, never an all-pairs product.
    * Recall is validated against [[topkBruteForce]] in the test suite; no
    * SQL oracle (the driver's rows-only check applies). */
  def topkLsh(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("sig", expr("rh_sig(e)"))
    // probe buckets: the query's own signature + each 1-bit flip (multiprobe)
    val probes = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("sig").as("qsig"))
      .withColumn("flip",
        explode(array((lit(0L) +: (0 until VectorExpressions.NumPlanes).map(p => lit(1L << p))): _*)))
      .withColumn("probe_sig", col("qsig").bitwiseXOR(col("flip")))
    val cand = base.join(broadcast(probes), col("sig") === col("probe_sig") &&
        col("vec_id") =!= col("q_id"))
      .dropDuplicates("q_id", "vec_id")
    cand
      .withColumn("cosine", expr("cosine_sim(qe, e)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id"), col("rank").cast("bigint").as("rank"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs: vectors sharing a hyperplane
    * bucket whose exact cosine clears the threshold. The self-join is on
    * the 8-bit signature — the corpus shuffles once by bucket, never
    * all-pairs — and exact cosine runs only within buckets. Approximate by
    * construction (bucket recall < 1), so rows-only: precision and score
    * agreement with brute force are asserted in SimilaritySuite. */
  def nearPairs(spark: SparkSession, dir: String): DataFrame = {
    val threshold = 0.3
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("sig", expr("rh_sig(e)"))
    val a = base.select(col("sig"), col("vec_id").as("vec_a"), col("e").as("ea"))
    val b = base.select(col("sig"), col("vec_id").as("vec_b"), col("e").as("eb"))
    a.join(b, Seq("sig"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", expr("cosine_sim(ea, eb)"))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** IVF-style approximate top-k: the label centroids act as the coarse
    * quantizer; every corpus vector is assigned to its nearest centroid
    * (narrow pass against a broadcast 10-row centroid table), and each query
    * searches only its `nprobe`=3 closest cells. The corpus shuffles once by
    * cell id; cost per query is |corpus|·nprobe/|cells|. Rows-only check
    * (the quantizer derives from summation-order-dependent averages). */
  def topkIvf(spark: SparkSession, dir: String): DataFrame = {
    val nprobe = 3
    val cents = labelCentroids(spark, dir)
      .select(col("label").as("cell"), col("centroid"))
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    // nearest centroid per vector: rank cells by cosine, keep the top one
    val cellRank = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell"))
    val assigned = base.crossJoin(broadcast(cents))
      .withColumn("csim", expr("cosine_sim(e, centroid)"))
      .withColumn("crank", row_number().over(cellRank))
    val corpusCells = assigned.filter(col("crank") === 1)
      .select(col("vec_id"), col("e"), col("cell"))
    val queryCells = assigned.filter(col("vec_id") < NumQueries && col("crank") <= nprobe)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("cell"))
    corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", expr("cosine_sim(qe, e)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id"), col("rank").cast("bigint").as("rank"), col("cosine"))
  }

  /** Element-wise centroid of each label's embeddings — the IVF coarse
    * quantizer build step. Position-exploded so partial aggregation applies;
    * no vector leaves a single reduce task. Rows-only check (float summation
    * order is partition-dependent, so no exact SQL oracle). */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("v"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(
        max(col("n")).as("n_vectors"),
        array_sort(collect_list(struct(col("pos"), col("v")))).getField("v").as("centroid"))
}
