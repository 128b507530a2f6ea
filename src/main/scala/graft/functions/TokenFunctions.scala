package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Tokenizer operators T1-T4 (SURVEY §2.10).
  *
  * The reference uses SharpToken cl100k_base (Search/Services/
  * ChatService.cs:183-192). No BPE vocabulary ships in this offline
  * container, so the engine uses a documented deterministic fallback with
  * identical *budget semantics*: a BPE-ish regex lexer that splits text
  * into word / number / punctuation-run / whitespace-run tokens. Token
  * COUNTS drive every reference behavior (W1 window, T5 trim, A1
  * accounting); the exact vocabulary does not, so the fallback preserves
  * all observable semantics. Swap [[Tokenizer]] for a real BPE to match
  * cl100k byte-for-byte.
  */
object Tokenizer extends Serializable {
  // word (letters incl. leading space), number run, non-space symbol run,
  // whitespace run — a simplified shape of the cl100k pre-tokenizer regex.
  private val pat = java.util.regex.Pattern.compile(
    """ ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+""")

  /** T1 Encode: text → token strings (the fallback's "ids" are the
    * surface strings themselves; decode is concatenation). */
  def encode(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val m = pat.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq
  }

  /** T2 Count. */
  def count(text: String): Int = encode(text).size

  /** T1+decode round-trip: decode(encode(x)) == x. */
  def decode(tokens: Seq[String]): String = tokens.mkString("")

  /** T3 head-truncate: keep the first n tokens (ChatService.cs:214-216). */
  def truncateHead(text: String, n: Int): String = decode(encode(text).take(n))

  /** T4 tail-truncate: keep the last n tokens (ChatService.cs:218-224). */
  def truncateTail(text: String, n: Int): String = decode(encode(text).takeRight(n)).stripLeading()
}

object TokenFunctions {
  val encode_tokens: Column => Column = { val u = udf((s: String) => Tokenizer.encode(s)); c => u(c) }
  val count_tokens: Column => Column = { val u = udf((s: String) => Tokenizer.count(s)); c => u(c) }
  val truncate_tokens_head: (Column, Column) => Column =
    { val u = udf((s: String, n: Int) => Tokenizer.truncateHead(s, n)); (c, n) => u(c, n) }
  val truncate_tokens_tail: (Column, Column) => Column =
    { val u = udf((s: String, n: Int) => Tokenizer.truncateTail(s, n)); (c, n) => u(c, n) }
}
