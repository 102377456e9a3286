package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min Sketch over long keys as a typed [[Aggregator]] — the
  * point-frequency member of the sketch family ([[MisraGries]] is the
  * heavy-hitters member, [[graft.events.EventQueries]] has HLL cardinality
  * and Greenwald-Khanna quantiles). Cormode & Muthukrishnan 2005.
  *
  * State is a flat `depth × width` counter array; an update increments one
  * counter per row, a point query takes the MIN across the rows. Two
  * properties make it the mergeable-summary of choice for per-key counts
  * at 100 TB:
  *   - the merge is elementwise SUM, so the sketch is not merely
  *     merge-tolerant like Misra-Gries (whose counters are merge-order
  *     dependent) — the final counters are BIT-IDENTICAL under every
  *     partitioning and merge order. Estimates are therefore exactly
  *     reproducible run to run, which is what lets the registered query
  *     hash-compare its contract flags against a DuckDB oracle.
  *   - state is `depth·width` longs per partition (160 KiB at 5×4096)
  *     regardless of key cardinality, vs the O(distinct keys) shuffle of
  *     the exact groupBy it stands in for.
  *
  * Error contract: estimates NEVER undercount (every counter an item
  * touches receives all of its increments), and overcount by at most the
  * colliding mass — expected N/width per row, so the min over `depth`
  * rows is within N/width·e with probability 1−e^−depth. The registered
  * query ([[graft.events.EventQueries.cmsUserCounts]]) audits both sides
  * against the exact count.
  *
  * Hashing must be byte-identical between this Scala update path and the
  * Catalyst probe expressions in [[CountMinSketch.probe]]: both compute
  * the Carter-Wegman family `((a·x' + b) mod p) mod width` with
  * p = 2³¹−1 (Mersenne) and x' = pmod(x, p), a, b < p. Every
  * intermediate is ≤ (2³¹)² = 2⁶² < Long.MaxValue, so the arithmetic is
  * exact under Spark's ANSI overflow checking (a wrapping splitmix-style
  * multiply would throw there) and trivially identical in Scala.
  */
object CountMinSketch {
  val Depth = 5
  val Width = 4096
  val P = 2147483647L // 2^31 - 1, prime

  /** Per-row (a, b) pairs for the Carter-Wegman hashes — fixed arbitrary
    * values in [1, p) so results are deterministic run to run. */
  val A: Array[Long] = Array(1941987711L, 1073741789L, 1500450271L,
    1232452867L, 1839123123L)
  val B: Array[Long] = Array(179424673L, 982451653L, 715225739L,
    514229563L, 362436069L)

  def bucket(row: Int, x: Long): Int = {
    val xp = ((x % P) + P) % P
    (((A(row) * xp + B(row)) % P) % Width).toInt
  }

  /** Catalyst-side point query: MIN over the depth rows of
    * `element_at(sketch, row·width + bucket + 1)` — the same hash as the
    * update path, expressed in codegen'd built-ins (no UDF). `sketch` is
    * the one-row aggregate output, expected broadcast-crossJoined. */
  def probe(sketch: Column, key: Column): Column =
    least((0 until Depth).map { i =>
      val h = pmod(pmod(lit(A(i)) * pmod(key, lit(P)) + lit(B(i)), lit(P)), lit(Width.toLong))
      element_at(sketch, (lit(i.toLong * Width) + h + lit(1L)).cast("int"))
    }: _*)
}

class CountMinSketch extends Aggregator[Long, Array[Long], Seq[Long]] {
  import CountMinSketch._

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(b: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < Depth) { b(i * Width + bucket(i, x)) += 1L; i += 1 }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
