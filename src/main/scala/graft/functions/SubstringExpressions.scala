package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for exact-substring dedup (the Lee et al. 2022
  * operator, "Deduplicating Training Data Makes Language Models Better"):
  * finding token spans that repeat verbatim ACROSS documents.
  *
  * The per-document kernel is a Karp-Rabin rolling fingerprint over the
  * shared letter-run tokens ([[graft.core.Tokenizer]]): every k-token
  * window's fingerprint in ONE O(n) pass — not O(n·k) rehashing — so the
  * whole-corpus fingerprinting stage is a narrow scan-side map, and the
  * shuffle that follows carries (fp: 8 bytes, doc_id, pos) instead of the
  * 50-token gram strings (a ~50× text blowup a string-keyed join would pay).
  * Fingerprint equality is necessary-not-sufficient (64-bit wraparound
  * polynomial); the caller re-derives gram STRINGS for the candidate sliver
  * via [[GramsAt]] and compares those, so the operator's output is exact
  * regardless of hash collisions.
  */
object SubstringExpressions {

  /** Karp-Rabin base: odd 64-bit constant (FNV prime); arithmetic wraps. */
  private val Base = 0x100000001b3L

  /** All k-token-window fingerprints of `text`, index = 0-based start
    * position in token space. Empty when the document has < k tokens. */
  def fps(text: UTF8String, k: Int): GenericArrayData = {
    val toks = graft.core.Tokenizer.letterTokens(text.toString)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = ShingleExpressions.hash64(toks(i)); i += 1 }
    var bk = 1L // Base^(k-1), for removing the departing token
    i = 0
    while (i < k - 1) { bk *= Base; i += 1 }
    val out = new Array[Long](n - k + 1)
    var fp = 0L
    i = 0
    while (i < k) { fp = fp * Base + h(i); i += 1 }
    out(0) = fp
    i = 1
    while (i <= n - k) {
      fp = (fp - h(i - 1) * bk) * Base + h(i + k - 1)
      out(i) = fp
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The gram strings at the given 0-based token positions — the exact
    * verification twin of [[fps]]: one tokenize per document, O(k) slice
    * per requested position (candidate positions only, never the corpus). */
  def gramsAt(text: UTF8String, positions: ArrayData, k: Int): GenericArrayData = {
    val toks = graft.core.Tokenizer.letterTokens(text.toString)
    val m = positions.numElements()
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val p = positions.getInt(i)
      out(i) = UTF8String.fromString(toks.slice(p, p + k).mkString(" "))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Modulus shared with [[RollingHash]]: intermediates stay below 2³⁶, so
    * the identical arithmetic is expressible in any engine's 64-bit SQL —
    * which is what lets the DuckDB oracle replay the SELECTION, not just
    * verify its output. */
  private val M = 2147483647L

  private def tokenHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % M
      i += Character.charCount(cp)
    }
    h
  }

  /** Winnowing selection (Schleimer et al. 2003, MOSS): the rightmost
    * minimal k-gram fingerprint of every w-gram window, O(n) via a
    * monotonic deque. Guarantee: two documents sharing a span of
    * ≥ k + w − 1 tokens select at least one common gram (the span contains
    * a full window at identical relative fingerprints). Fingerprints are
    * Horner mod 2³¹−1 over per-token hashes — rolling removal via the
    * precomputed 31^(k−1) mod M — so both engines compute the identical
    * selection. Returns array<struct<pos,fp>>, positions ascending;
    * a document with fewer than w grams winnows its single short window. */
  def winnowSelect(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val toks = graft.core.Tokenizer.letterTokens(text.toString)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val nG = n - k + 1
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = tokenHash(toks(i)); i += 1 }
    var bk = 1L
    i = 0
    while (i < k - 1) { bk = (bk * 31) % M; i += 1 }
    val fps = new Array[Long](nG)
    var fp = 0L
    i = 0
    while (i < k) { fp = (fp * 31 + th(i)) % M; i += 1 }
    fps(0) = fp
    i = 1
    while (i <= n - k) {
      fp = (((fp - (th(i - 1) * bk) % M + M) % M) * 31 + th(i + k - 1)) % M
      fps(i) = fp
      i += 1
    }
    val ww = math.min(w, nG)
    // monotonic deque of gram indices; back-pops on >= prefer the RIGHTMOST
    // minimum, matching the oracle's ORDER BY fp ASC, pos DESC tie-break
    val deque = new java.util.ArrayDeque[Int]()
    val out = new java.util.ArrayList[Any]()
    var lastEmitted = -1
    i = 0
    while (i < nG) {
      while (!deque.isEmpty && fps(deque.peekLast()) >= fps(i)) deque.pollLast()
      deque.addLast(i)
      if (i >= ww - 1) {
        while (deque.peekFirst() <= i - ww) deque.pollFirst()
        val m = deque.peekFirst()
        if (m != lastEmitted) {
          out.add(org.apache.spark.sql.catalyst.InternalRow(m, fps(m)))
          lastEmitted = m
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  val winnowSelectDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_select"),
    new ExpressionInfo(classOf[WinnowSelect].getName, "winnow_select"),
    (args: Seq[Expression]) => WinnowSelect(args(0), args(1), args(2)))

  private[functions] def checkK(prettyName: String, k: Expression): TypeCheckResult =
    if (!k.foldable || k.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName span length must be a foldable int literal, got ${k.sql}")
    else k.eval() match {
      case n: Int if n >= 2 && n <= 10000 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName span length must be in [2, 10000], got $other")
    }

  val gramFpsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gram_fps"),
    new ExpressionInfo(classOf[GramFps].getName, "gram_fps"),
    (args: Seq[Expression]) => GramFps(args(0), args(1)))

  val gramsAtDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("grams_at"),
    new ExpressionInfo(classOf[GramsAt].getName, "grams_at"),
    (args: Seq[Expression]) => GramsAt(args(0), args(1), args(2)))
}

/** `gram_fps(text, k)` → `array<bigint>`: the Karp-Rabin fingerprint of
  * every k-token window, array index = 0-based window start. */
case class GramFps(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_fps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName text must be a string, got ${left.dataType.sql}")
    else SubstringExpressions.checkK(prettyName, right)

  override protected def nullSafeEval(text: Any, k: Any): Any =
    SubstringExpressions.fps(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  // the generated code calls the same static kernel eval uses, so the
  // postings scan stays inside the WholeStageCodegen span instead of
  // breaking it with an interpreted-fallback boundary
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.SubstringExpressions.fps($t, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GramFps =
    copy(left = newLeft, right = newRight)
}

/** `winnow_select(text, k, w)` → `array<struct<pos:int, fp:bigint>>`: the
  * winnowing-selected k-gram fingerprints (rightmost window minima). */
case class WinnowSelect(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_select"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName text must be a string, got ${first.dataType.sql}")
    else SubstringExpressions.checkK(prettyName, second) match {
      case TypeCheckResult.TypeCheckSuccess => SubstringExpressions.checkK(prettyName, third)
      case fail => fail
    }

  override protected def nullSafeEval(text: Any, k: Any, w: Any): Any =
    SubstringExpressions.winnowSelect(
      text.asInstanceOf[UTF8String], k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) =>
      s"graft.functions.SubstringExpressions.winnowSelect($t, $k, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowSelect =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `grams_at(text, positions, k)` → `array<string>`: the k-token gram
  * starting at each 0-based token position, aligned with `positions`. */
case class GramsAt(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "grams_at"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName text must be a string, got ${first.dataType.sql}")
    else if (!second.dataType.isInstanceOf[ArrayType] ||
      second.dataType.asInstanceOf[ArrayType].elementType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName positions must be array<int>, got ${second.dataType.sql}")
    else SubstringExpressions.checkK(prettyName, third)

  override protected def nullSafeEval(text: Any, positions: Any, k: Any): Any =
    SubstringExpressions.gramsAt(
      text.asInstanceOf[UTF8String], positions.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p, k) =>
      s"graft.functions.SubstringExpressions.gramsAt($t, $p, $k)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GramsAt =
    copy(first = newFirst, second = newSecond, third = newThird)
}
