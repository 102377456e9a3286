package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(text)` → bigint: the classic polynomial rolling hash
  * h ← (31·h + codepoint) mod (2³¹−1) over the document's code points —
  * document fingerprinting cheap enough to sit inline in an ingest scan.
  * The modulus keeps every intermediate below 2³⁶ so the same arithmetic is
  * expressible in any engine's 64-bit integer SQL (the DuckDB oracle
  * replays it with list_reduce). Codegen calls the same static kernel as
  * interpreted eval, so scans keep their whole-stage span. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kernel = RollingHash.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$kernel.hash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** The shared kernel (static forwarder → callable from generated code). */
  def hash(input: UTF8String): Long = {
    val s = input.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (args: Seq[Expression]) => RollingHash(args.head))
}
