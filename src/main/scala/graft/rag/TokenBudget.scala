package graft.rag

import graft.functions.Tokenizer

/** Exact-semantics ports of the reference's token-budget dataflow
  * (SURVEY §2.10 T5 + §2.5 W1) — golden-test-sensitive (§7.4).
  */
object TokenBudget {

  /** T5 — BuildPrompts (ChatService.cs:172-243), bit-exact:
    *  - buffer of 200 tokens (line 180);
    *  - percentages computed in FLOAT of the total INCLUDING prompt and
    *    buffer (lines 206-207);
    *  - Math.Round(..., 0) is half-even => math.rint (lines 209-210);
    *  - rag keeps its HEAD, conversation keeps its TAIL (lines 214-224);
    *  - user prompt is never trimmed; joined with "\n" (Environment.NewLine).
    */
  def buildPrompts(userPrompt: String, conversation: String, retrievedData: String,
                   maxCompletionTokens: Int,
                   codec: graft.functions.TokenCodec = Tokenizer): (String, String) = {
    val bufferTokens = 200
    val ragTokens = codec.count(retrievedData)
    val convTokens = codec.count(conversation)
    val userPromptTokens = codec.count(userPrompt)

    val totalTokens = ragTokens + convTokens + userPromptTokens + bufferTokens
    if (totalTokens > maxCompletionTokens) {
      val tokensToReduce = totalTokens - maxCompletionTokens
      val ragTokenPct = ragTokens.toFloat / totalTokens
      val conTokenPct = convTokens.toFloat / totalTokens
      val newRagTokens = math.rint((ragTokens - ragTokenPct * tokensToReduce).toDouble).toInt
      val newConvTokens = math.rint((convTokens - conTokenPct * tokensToReduce).toDouble).toInt

      val augmented = codec.truncateHead(retrievedData, newRagTokens)
      val offset = convTokens - newConvTokens
      val trimmedConv = codec.slice(conversation, offset, offset + newConvTokens)
      (augmented, trimmedConv + "\n" + userPrompt)
    } else {
      (retrievedData, conversation + "\n" + userPrompt)
    }
  }

  /** W1 — GetConversationHistory (ChatService.cs:248-271), driver form
    * over an already-loaded session history (sessions are small; the
    * DataFrame window form of the same semantics is queries.q10).
    *
    * Reference quirk preserved: `(tokensUsed += m.Tokens) <= budget`
    * increments BEFORE comparing, so the first over-budget message is
    * excluded but its tokens already counted — TakeWhile on the running
    * sum including the current row reproduces it exactly.
    */
  def conversationHistory(messages: Seq[(java.sql.Timestamp, Int, String)],
                          maxConversationTokens: Int): String = {
    var tokensUsed = 0
    val trimmed = messages
      .sortBy(_._1.getTime)(Ordering[Long].reverse)
      .takeWhile { case (_, tokens, _) => tokensUsed += tokens; tokensUsed <= maxConversationTokens }
      .map(_._3)
      .reverse
    trimmed.mkString("\n")
  }
}
