package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup pipeline.
  *
  * The composed-builtin formulation (tokenize → `transform` → `array_distinct`
  * → per-shingle hashing) is semantically fine but runs interpreted —
  * higher-order functions have no codegen — and re-evaluates the whole chain
  * per consumer. These expressions do the entire
  * tokenize→shingle→dedup→hash→min pipeline in one JVM loop per document
  * (preference (b) of the build brief: custom Expression over UDF).
  *
  * Tokenization matches the reference tokenizer spec — runs of Unicode
  * letters, case preserved (`/root/reference/src/mrapps/wc.go:21-24`) — via
  * `Character.isLetter` over code points, equivalent to `[^\p{L}]+`
  * splitting for all planes.
  */
object ShingleExpressions {

  val ShingleWords = 3

  /** Distinct word-`n`-gram strings of a document, via the shared
    * [[graft.core.Tokenizer]] (tokenizer fidelity is load-bearing for both
    * golden parity and dedup oracle equality — one implementation only). */
  def shingles(text: String): mutable.LinkedHashSet[String] = {
    val toks = graft.core.Tokenizer.letterTokens(text)
    val out = mutable.LinkedHashSet.empty[String]
    var j = 0
    while (j + ShingleWords <= toks.length) {
      out += s"${toks(j)} ${toks(j + 1)} ${toks(j + 2)}"
      j += 1
    }
    out
  }

  /** FNV-1a 64-bit over UTF-8 bytes with a final avalanche. */
  def hash64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    mix(h)
  }

  /** splitmix64 finalizer. */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val minHashSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (args: Seq[Expression]) => MinHashSig(args.head))

  val simHashSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_sig"),
    new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
    (args: Seq[Expression]) => SimHashSig(args(0), args(1)))

  val shingleSetDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_set"),
    new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
    (args: Seq[Expression]) => ShingleSet(args.head))
}

/** `minhash_sig(text)` → `array<bigint>` of [[MinHashSig.NumHashes]] minhash
  * values over the document's distinct 3-word shingles. Empty array when the
  * document has fewer than 3 tokens. */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[UTF8String])

  // static-kernel codegen (the SimHashSig pattern): the signature loop is
  // one JVM call, and the surrounding scan stays whole-stage-compiled
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.MinHashSig.sig($t)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import ShingleExpressions._

  val NumHashes = 64

  /** Shared kernel for eval and generated code. */
  def sig(text: UTF8String): GenericArrayData = {
    val sh = shingles(text.toString)
    if (sh.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    sh.foreach { s =>
      val h = hash64(s)
      var k = 0
      while (k < NumHashes) {
        val hk = mix(h + k * 0x9e3779b97f4a7c15L)
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
    }
    new GenericArrayData(mins)
  }
}

/** `simhash_sig(text, nHexDigits)` → bigint: the `4·nHexDigits`-bit SimHash
  * of the document's letter-run tokens, each distinct token weighted by its
  * occurrence count and hashed to its first `nHexDigits` md5 hex digits —
  * numerically identical to the two-phase SQL formulation
  * (`graft.dedup.DedupQueries.simhashN` / the DuckDB oracle: integer
  * bit-plane sums are order-free), but computed in ONE narrow pass per
  * document instead of a (doc, token) shuffle plus a 4·nHexDigits-column
  * aggregate. Returns null for a tokenless document (the two-phase path
  * emits no row — callers filter nulls to match). */
case class SimHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"
  override def nullable: Boolean = true

  /** `nHexDigits` must be a foldable int in [1, 15], validated here at
    * analysis (mirrors [[RandomHyperplaneSig.checkInputDataTypes]]) — a bad
    * or column-valued width should fail when the plan is built, not
    * row-by-row at execution. */
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName text must be a string, got ${left.dataType.sql}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName nHexDigits must be a foldable int literal, got ${right.sql}")
    else right.eval() match {
      case n: Int if n >= 1 && n <= 15 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName nHexDigits must be in [1, 15], got $other")
    }
  }

  override protected def nullSafeEval(input: Any, nHex: Any): Any =
    SimHashKernel.sigOrNull(input.asInstanceOf[UTF8String], nHex.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("sigBoxed")
    val kernel = SimHashKernel.getClass.getName.stripSuffix("$")
    val code =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = 0L;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  java.lang.Long $boxed = $kernel.sigOrNull(${leftGen.value}, ${rightGen.value});
        |  if ($boxed != null) {
        |    ${ev.isNull} = false;
        |    ${ev.value} = $boxed.longValue();
        |  }
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SimHashSig =
    copy(left = newLeft, right = newRight)
}

/** The simhash kernel, shared by interpreted eval and generated code.
  * Returns null (boxed) for a tokenless document — the two-phase aggregate
  * formulation emits no row there, and callers filter nulls to match. */
object SimHashKernel {
  def sigOrNull(input: UTF8String, hexDigits: Int): java.lang.Long = {
    require(hexDigits >= 1 && hexDigits <= 15, "simhash_sig: nHexDigits must be in [1,15]")
    val bits = hexDigits * 4
    val toks = graft.core.Tokenizer.letterTokens(input.toString)
    if (toks.isEmpty) return null
    val counts = mutable.HashMap.empty[String, Long]
    toks.foreach(t => counts.update(t, counts.getOrElse(t, 0L) + 1L))
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Long](bits)
    counts.foreach { case (word, cnt) =>
      md.reset()
      val d = md.digest(word.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // value of the first hexDigits hex characters read as a base-16 number
      var h = 0L
      var i = 0
      while (i < hexDigits / 2) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      if (hexDigits % 2 == 1) h = (h << 4) | ((d(hexDigits / 2) >> 4) & 0xfL)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) sums(j) += cnt else sums(j) -= cnt
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < bits) { if (sums(j) > 0) sig |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sig)
  }
}

/** `shingle_set(text)` → `array<string>` of the document's distinct 3-word
  * shingles (insertion order). */
case class ShingleSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleSet.set(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.ShingleSet.set($t)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  /** Shared kernel for eval and generated code. */
  def set(text: UTF8String): GenericArrayData = {
    val sh = ShingleExpressions.shingles(text.toString)
    new GenericArrayData(sh.iterator.map(UTF8String.fromString).toArray[Any])
  }
}
