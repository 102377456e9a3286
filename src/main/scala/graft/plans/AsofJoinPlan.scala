package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN — the whole-operator Catalyst extension
  * (LogicalPlan + SparkStrategy + SparkPlan, registered through
  * `SparkSessionExtensions.injectPlannerStrategy`): each left row is
  * paired with the LATEST right row of the same key whose (time, seq)
  * is strictly before the left row's, or nulls when none exists — the
  * time-series point-in-time lookup Spark has no built-in operator for.
  *
  * Why a physical operator when [[graft.events.EventQueries.asofPurchase]]
  * already composes the same semantics from a window: the window
  * formulation must UNION both streams into one frame and carry the
  * last-purchase columns across every intervening row, while this exec
  * consumes the two sorted sides directly — one forward merge pass, no
  * union row inflation, and the right side's columns never travel through
  * a window buffer. Both formulations share one DuckDB oracle
  * (`events_asof` / `events_asof_native`), so the custom operator is
  * hash-verified against an independent engine, not just against Spark.
  *
  * Scale shape: `requiredChildDistribution` clusters both sides by key
  * (Catalyst inserts the exchanges and co-partitions them exactly as it
  * does for sort-merge join) and `requiredChildOrdering` demands
  * (key, time, seq) sort; the merge itself is then a single
  * O(|L| + |R|) pass per partition holding ONE buffered right row —
  * state O(1), no per-key history. Keys, times and seqs are LongType
  * expressions (the engine's canonical id/epoch types); the comparison
  * is lexicographic (time, seq) so microsecond ties resolve by the
  * unique sequence id, deterministically. */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    leftSeq: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightSeq: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, lt, ls, rk, rt, rs) =>
      AsofJoinExec(lk, lt, ls, rk, rt, rs, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKey: Expression,
    leftTime: Expression,
    leftSeq: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightSeq: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(leftKey, leftTime, leftSeq).map(SortOrder(_, Ascending)),
    Seq(rightKey, rightTime, rightSeq).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(leftKey, leftTime, leftSeq).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val ls = BindReferences.bindReference(leftSeq, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val rs = BindReferences.bindReference(rightSeq, right.output)
    // the projection must see the RIGHT side as nullable (the no-match row
    // is all nulls); `output` carries the adjusted attributes, and
    // withNullability preserves exprIds so the self-binding resolves
    val outAttrs = output
    val nRight = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nulls = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // ONE retained right row: the latest one at or before the merge
      // frontier, copied out of the iterator's reused buffer
      var matchKey = 0L
      var hasMatch = false
      var matchRow: InternalRow = null
      lIter.map { lRow =>
        val k = lk.eval(lRow).asInstanceOf[Long]
        val t = lt.eval(lRow).asInstanceOf[Long]
        val s = ls.eval(lRow).asInstanceOf[Long]
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val hk = rk.eval(head).asInstanceOf[Long]
          val before = hk < k || (hk == k && {
            val ht = rt.eval(head).asInstanceOf[Long]
            ht < t || (ht == t && rs.eval(head).asInstanceOf[Long] < s)
          })
          if (before) {
            if (hk == k) { matchRow = head.copy(); matchKey = k; hasMatch = true }
            rBuf.next()
          } else advancing = false
        }
        val r = if (hasMatch && matchKey == k) matchRow else nulls
        proj(joined(lRow, r))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entrypoint for the native as-of join. */
object AsofJoinOps {
  /** `asof(left, right)(k, t, s)`: column NAMES are resolved against each
    * side's analyzed output (LongType required — ids and epoch numbers). */
  def asof(
      spark: SparkSession,
      left: DataFrame, lKey: String, lTime: String, lSeq: String,
      right: DataFrame, rKey: String, rTime: String, rSeq: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def a(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"asof: column $n not found in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graft.GraftBridge.ofRows(spark,
      AsofJoin(lp, rp,
        a(lp, lKey), a(lp, lTime), a(lp, lSeq),
        a(rp, rKey), a(rp, rTime), a(rp, rSeq)))
  }
}
