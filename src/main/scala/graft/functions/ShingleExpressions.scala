package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
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

  val shingleSetDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_set"),
    new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
    (args: Seq[Expression]) => ShingleSet(args.head))
}

/** `minhash_sig(text)` → `array<bigint>` of [[MinHashSig.NumHashes]] minhash
  * values over the document's distinct 3-word shingles. Empty array when the
  * document has fewer than 3 tokens. */
case class MinHashSig(child: Expression) extends UnaryExpression with CodegenFallback {
  import ShingleExpressions._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val sh = shingles(input.asInstanceOf[UTF8String].toString)
    if (sh.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val mins = Array.fill(MinHashSig.NumHashes)(Long.MaxValue)
    sh.foreach { s =>
      val h = hash64(s)
      var k = 0
      while (k < MinHashSig.NumHashes) {
        val hk = mix(h + k * 0x9e3779b97f4a7c15L)
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val NumHashes = 64
}

/** `shingle_set(text)` → `array<string>` of the document's distinct 3-word
  * shingles (insertion order). */
case class ShingleSet(child: Expression) extends UnaryExpression with CodegenFallback {
  import ShingleExpressions._

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any = {
    val sh = shingles(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(sh.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}
