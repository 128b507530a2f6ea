package graft.functions

/** Seam between the token-budget dataflow (T1-T5, W1) and a concrete
  * tokenizer. Two implementations ship:
  *
  *  - [[Tokenizer]] — the dependency-free regex lexer fallback;
  *  - [[Bpe]] — a real byte-level BPE (trained vocab, integer ids),
  *    the cl100k_base-class tokenizer the reference uses via SharpToken
  *    (Search/Services/ChatService.cs:183-192).
  *
  * Everything budget-shaped needs only these four string-level
  * operations, so swapping vocabularies never touches the budget code —
  * the same guarantee the reference gets from the GptEncoding seam.
  */
trait TokenCodec extends Serializable {
  /** T2: number of tokens in `text`. */
  def count(text: String): Int

  /** T3: keep the first `n` tokens. */
  def truncateHead(text: String, n: Int): String

  /** T4: keep the last `n` tokens (leading whitespace stripped, matching
    * the reference's trimmed-conversation rendering). */
  def truncateTail(text: String, n: Int): String

  /** Token-space slice: decode(encode(text).slice(from, until)) — what
    * T5's proportional trim needs beyond head/tail. */
  def slice(text: String, from: Int, until: Int): String
}
