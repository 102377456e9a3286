package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator: keeps the k largest (value, id) pairs per
  * group, ordered by value descending then id ascending.
  *
  * This is the commutative lowering of a "top k per key" reduce (SURVEY.md
  * §2.1 F7): because it is an [[Aggregator]], Spark runs it with partial
  * aggregation — each map partition ships AT MOST k rows per key into the
  * shuffle, and no sort happens anywhere (the window-rank formulation is
  * also k-bounded pre-shuffle by Spark's WindowGroupLimit, but still sorts
  * within each partition).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Long, Double)]] {

  /** value desc, then id asc — the deterministic rank order.
    * `Double.compare` (not `>`): total over NaN/-0.0, matching Spark's SQL
    * double ordering so this path can never diverge from the window twin. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    val (before, after) = buf.span(better(_, x))
    (before ++ (x +: after)).take(k)
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], row: (Long, Double)): Seq[(Double, Long)] =
    insert(buf, (row._2, row._1))

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b2.foldLeft(b1)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Long, Double)] =
    buf.map { case (v, id) => (id, v) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
