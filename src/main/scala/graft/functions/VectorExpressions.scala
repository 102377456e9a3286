package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
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

  /** Default signature width: the multiprobe top-k bucket (`topkLsh`). */
  val NumPlanes = 8

  /** Wide signature for the near-pair path: 64 planes banded 4 × 16 bits
    * ([[graft.similarity.SimilarityQueries.nearPairs]]) so band buckets stay
    * sparse as the corpus grows — the 8-bit single-bucket space is a
    * constant 256 and goes quadratic within buckets at scale. */
  val WidePlanes = 64

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
    (args: Seq[Expression]) => args match {
      case Seq(v)    => RandomHyperplaneSig(v, Literal(NumPlanes))
      case Seq(v, n) => RandomHyperplaneSig(v, n)
      case other => throw new IllegalArgumentException(
        s"rh_sig expects 1 or 2 arguments, got ${other.size}")
    })
}

/** The ordered-fold cosine kernel, shared by interpreted eval and generated
  * code (one JVM method → JIT-friendly, bit-identical on both paths).
  * Returns a boxed Double or null: mismatched dimensionality and zero-norm
  * inputs are undefined — null (what an out-of-bounds index / 0-divide
  * yields in SQL engines) rather than a silently-truncated or NaN value. */
object VectorOps {
  /** The rh_sig kernel: sign bit per deterministic Rademacher hyperplane. */
  def rhSig(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var d = 0
      while (d < n) { proj += v.getDouble(d) * VectorExpressions.planeSign(p, d); d += 1 }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def cosineOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
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
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** `cosine_sim(array<double>, array<double>)` → double. Participates in
  * whole-stage codegen (unlike the other, colder native expressions, which
  * stay CodegenFallback): the generated code calls the same static kernel
  * the interpreted path uses, so the hot similarity loops keep their
  * codegen span without duplicating the fold. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.cosineOrNull(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("cosBoxed")
    val kernel = VectorOps.getClass.getName.stripSuffix("$") // graft.functions.VectorOps
    val code =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |boolean ${ev.isNull} = true;
        |double ${ev.value} = 0.0;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  java.lang.Double $boxed = $kernel.cosineOrNull(${leftGen.value}, ${rightGen.value});
        |  if ($boxed != null) {
        |    ${ev.isNull} = false;
        |    ${ev.value} = $boxed.doubleValue();
        |  }
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `rh_sig(array<double>[, nPlanes])` → bigint: sign bit per deterministic
  * Rademacher hyperplane, packed little-endian; `nPlanes` defaults to
  * [[VectorExpressions.NumPlanes]] and must be a foldable int in [1, 64]
  * (validated at analysis, not per-row at execution). Codegen calls the
  * same static kernel as interpreted eval (null only propagates from a null
  * vector, so the default null-safe codegen applies). */
case class RandomHyperplaneSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rh_sig"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName nPlanes must be a foldable int literal, got ${right.sql}")
    else right.eval() match {
      case n: Int if n >= 1 && n <= 64 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName nPlanes must be in [1, 64], got $other")
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.rhSig(l.asInstanceOf[ArrayData], r.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kernel = VectorOps.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (c, n) => s"$kernel.rhSig($c, $n)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RandomHyperplaneSig =
    copy(left = newLeft, right = newRight)
}
