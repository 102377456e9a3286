package graft.core

/** THE letter-run tokenizer — the reference's spec
  * (`/root/reference/src/mrapps/wc.go:21-24`: split on `unicode.IsLetter`
  * complement, case preserved), shared by every JVM-side consumer so wc
  * parity and shingle/minhash semantics can never desynchronize. The
  * column-expression twin is `graft.text.TextQueries.tokens`
  * (`[^\p{L}]+` split — equivalent for all planes). */
object Tokenizer {
  def letterTokens(text: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) sb.appendCodePoint(cp)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out += sb.toString
    out.result()
  }
}
