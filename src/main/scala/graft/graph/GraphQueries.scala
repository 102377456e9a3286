package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over relationally-derived graphs.
  *
  * The reference engine's (map, reduce) model covers one round of message
  * passing per job (`/root/reference/src/mr/worker.go:39` — the same shape
  * the original MapReduce paper demonstrates with PageRank); these operators
  * are the multi-round / join-heavy graph shapes that a declarative engine
  * plans far better than hand-chained MR rounds. The iterative primitive
  * (label propagation, PageRank) lives in [[graft.dedup.DedupQueries]]; this
  * module holds the one-shot combinatorial shapes.
  */
object GraphQueries {

  /** The co-purchase edge list: distinct undirected part pairs that appear
    * in the same order, emitted once with `u < v`. Per-order line counts
    * are bounded (≤7 in TPC-H shape, small in any basket data), so the
    * in-order pair expansion is a bounded narrow explode; the only shuffle
    * is the distinct on the edge key. */
  private def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    li.as("a").join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
  }

  /** Per-part triangle participation counts in the co-purchase graph — the
    * clustering-coefficient numerator, the classic "bought together" motif.
    *
    * Enumeration is DEGREE-ORIENTED (the compact-forward / Cohen MapReduce
    * triangle algorithm): every undirected edge is directed from its
    * lower-(degree, id) endpoint to the higher one, wedges are built only
    * from each node's OUT-edges, and a wedge (u→v, u→w) closes iff the
    * oriented edge v→w exists. Orienting by degree bounds every node's
    * out-degree by O(√m) regardless of the in-degree skew — a hub part in
    * 10⁶ orders contributes wedges proportional to its (small) out-degree,
    * not deg² — which is the difference between this running at 100 TB and
    * the naive id-ordered join melting on the first popular part. Any
    * total order yields each triangle exactly once, so the id-ordered
    * DuckDB oracle produces the identical triangle set and counts.
    *
    * Three joins total: wedge self-join on the source (shuffle by `u`),
    * the closing left-semi probe on (v, w), and the final role-union
    * count-by-part. The edge list is |E|-sized — orders×(lines choose 2)
    * distinct pairs — minuscule next to the fact table that generated it. */
  def copurchaseTriangles(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the oriented edge list is consumed twice (wedge sides
    // share one subtree via self-join aliasing, the closing probe is the
    // second consumer); recomputing it would re-run the distinct.
    val edges = graft.Caches.persisted(copurchaseEdges(spark, dir))
    val deg = edges.select(col("u").as("n")).union(edges.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient: src = the endpoint earlier in the (degree, id) total order;
    // `ord` carries the dst's position in that order for the wedge-leaf
    // comparison below (same-named struct fields so the branches unify)
    val uKey = struct(col("du").as("d"), col("u").as("n"))
    val vKey = struct(col("dv").as("d"), col("v").as("n"))
    val oriented = graft.Caches.persisted(
      edges
        .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
        .select(
          when(uKey < vKey, col("u")).otherwise(col("v")).as("src"),
          when(uKey < vKey, col("v")).otherwise(col("u")).as("dst"),
          when(uKey < vKey, vKey).otherwise(uKey).as("ord")))
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.ord") < col("e2.ord"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      // the wedge's two leaves are ordered by the SAME total order the
      // orientation used, so a closing edge can only be stored as b→c
      .join(oriented.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part_id"))
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("triangles"))
  }

  /** Oracle: id-ordered enumeration (u < v < w, every edge stored once as
    * u < v) — a different total order than the degree orientation, but any
    * acyclic orientation from a total order enumerates each triangle
    * exactly once, so the triangle multiset and per-part counts match. */
  def copurchaseTrianglesSql: String =
    """WITH e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |tri AS (
      |  SELECT ab.u AS a, ab.v AS b, bc.v AS c
      |  FROM e ab JOIN e bc ON ab.v = bc.u
      |  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v)
      |SELECT part_id, count(*) AS triangles
      |FROM (SELECT a AS part_id FROM tri
      |      UNION ALL SELECT b FROM tri
      |      UNION ALL SELECT c FROM tri) r
      |GROUP BY part_id""".stripMargin
}
