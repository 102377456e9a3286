package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sorted-array set operations.
  *
  * `sorted_intersect(a, b)` intersects two SORTED, duplicate-free bigint
  * arrays by a two-pointer merge — O(|a| + |b|) primitive long comparisons
  * with one output allocation. The built-in `array_intersect` gives the
  * same answer but builds a hash set per ROW; on the triangle-closing scan
  * ([[graft.graph.GraphQueries.copurchaseTriangles]]: |E| rows × ~2·avgdeg
  * elements) the per-row allocation + hashing dominated the whole query
  * (measured ~3× the pass wall at sf0.1). Sortedness is the caller's
  * contract (adjacency lists are built with `sort_array`); it is NOT
  * checked per row — an unsorted input silently under-intersects, which is
  * why the expression is registered under its contract-bearing name rather
  * than shadowing the built-in.
  */
object ArrayExpressions {
  val sortedIntersectDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_intersect"),
    new ExpressionInfo(classOf[SortedIntersect].getName, "sorted_intersect"),
    (args: Seq[Expression]) => SortedIntersect(args(0), args(1)))
}

object SortedArrayOps {
  /** Two-pointer intersection of sorted long arrays (the merge step of
    * merge-sort, emitting equal heads). Shared by interpreted eval and
    * generated code. */
  def intersect(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = b.numElements()
    val out = new Array[Long](math.min(n, m))
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    new GenericArrayData(if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }
}

/** `sorted_intersect(array<bigint>, array<bigint>)` → array<bigint>.
  * Codegen calls the same static kernel as interpreted eval. */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SortedArrayOps.intersect(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kernel = SortedArrayOps.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$kernel.intersect($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}
