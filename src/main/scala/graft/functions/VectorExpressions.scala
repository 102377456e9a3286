package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector expressions for the similarity-search operators.
  *
  * `cosine_sim` replicates, bit-for-bit, the canonical ordered fold
  * (dot = Σ aᵢ·bᵢ left-to-right, norms likewise, one final division) that
  * the DuckDB oracle also computes — but in a single JVM loop instead of
  * interpreted `zip_with`/`aggregate` trees. `rh_sig` computes the 8-bit
  * random-hyperplane bucket; the composed-column formulation was a 512-term
  * expression tree whose codegen compilation dominated query time.
  */
object VectorExpressions {

  val NumPlanes = 8

  /** splitmix64 — deterministic ±1 hyperplane component for (plane, dim). */
  def planeSign(p: Int, d: Int): Double = {
    var z = p.toLong * 0x9e3779b97f4a7c15L + d.toLong * 0xbf58476d1ce4e5b9L + 0x94d049bb133111ebL
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (args: Seq[Expression]) => CosineSim(args(0), args(1)))

  val rhSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rh_sig"),
    new ExpressionInfo(classOf[RandomHyperplaneSig].getName, "rh_sig"),
    (args: Seq[Expression]) => RandomHyperplaneSig(args.head))
}

/** `cosine_sim(array<double>, array<double>)` → double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // mismatched dimensionality and zero-norm inputs are undefined — return
    // null (what an out-of-bounds index / 0-divide yields in SQL engines)
    // rather than a silently-truncated or NaN similarity
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `rh_sig(array<double>)` → bigint: sign bit per deterministic Rademacher
  * hyperplane, packed little-endian. */
case class RandomHyperplaneSig(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import VectorExpressions._

  override def dataType: DataType = LongType
  override def prettyName: String = "rh_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < NumPlanes) {
      var proj = 0.0
      var d = 0
      while (d < n) { proj += v.getDouble(d) * planeSign(p, d); d += 1 }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): RandomHyperplaneSig =
    copy(child = newChild)
}
