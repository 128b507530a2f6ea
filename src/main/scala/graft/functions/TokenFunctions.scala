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
object Tokenizer extends TokenCodec {
  // word (letters incl. leading space), number run, non-space symbol run,
  // whitespace run — a simplified shape of the cl100k pre-tokenizer regex.
  private val pat = java.util.regex.Pattern.compile(
    """ ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+""")

  /** The shared pre-tokenizer: every codec (this lexer AND [[Bpe]])
    * splits on the same boundaries, so merges never cross a word edge. */
  def pieces(text: String): Iterator[String] = {
    if (text == null) return Iterator.empty
    val m = pat.matcher(text)
    new Iterator[String] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): String = { val g = m.group(); has = m.find(); g }
    }
  }

  /** T1 Encode: text → token strings (the fallback's "ids" are the
    * surface strings themselves; decode is concatenation). */
  def encode(text: String): Seq[String] = pieces(text).toSeq

  /** T2 Count. */
  override def count(text: String): Int = {
    var n = 0; val it = pieces(text); while (it.hasNext) { it.next(); n += 1 }; n
  }

  /** T1+decode round-trip: decode(encode(x)) == x. */
  def decode(tokens: Seq[String]): String = tokens.mkString("")

  /** T3 head-truncate: keep the first n tokens (ChatService.cs:214-216). */
  override def truncateHead(text: String, n: Int): String = decode(encode(text).take(n))

  /** T4 tail-truncate: keep the last n tokens (ChatService.cs:218-224). */
  override def truncateTail(text: String, n: Int): String = decode(encode(text).takeRight(n)).stripLeading()

  override def slice(text: String, from: Int, until: Int): String =
    decode(encode(text).slice(from, until))
}

object TokenFunctions {
  val encode_tokens: Column => Column = { val u = udf((s: String) => Tokenizer.encode(s)); c => u(c) }
  val count_tokens: Column => Column = { val u = udf((s: String) => Tokenizer.count(s)); c => u(c) }
  val truncate_tokens_head: (Column, Column) => Column =
    { val u = udf((s: String, n: Int) => Tokenizer.truncateHead(s, n)); (c, n) => u(c, n) }
  val truncate_tokens_tail: (Column, Column) => Column =
    { val u = udf((s: String, n: Int) => Tokenizer.truncateTail(s, n)); (c, n) => u(c, n) }

  // Real-BPE variants over the shipped vocabulary (ids, not surface
  // strings — Bpe.default loads once per executor JVM).
  val encode_tokens_bpe: Column => Column =
    { val u = udf((s: String) => Bpe.default.encodeIds(s)); c => u(c) }
  val count_tokens_bpe: Column => Column =
    { val u = udf((s: String) => Bpe.default.count(s)); c => u(c) }
  val truncate_tokens_bpe_head: (Column, Column) => Column =
    { val u = udf((s: String, n: Int) => Bpe.default.truncateHead(s, n)); (c, n) => u(c, n) }
  val truncate_tokens_bpe_tail: (Column, Column) => Column =
    { val u = udf((s: String, n: Int) => Bpe.default.truncateTail(s, n)); (c, n) => u(c, n) }
}
