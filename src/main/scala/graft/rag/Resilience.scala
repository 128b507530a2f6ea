package graft.rag

import graft.embed.Embedder

/** Production hardening for the model-call boundary — the engine's
  * analog of the reference's Polly-style retry handler
  * (SharedLib/Services/OpenAiService.cs:97-105: 10 attempts, exponential
  * backoff) plus its MaxEmbeddingTokens input cap (appsettings.json:17,
  * OpenAiService.cs:122-155).
  *
  * Retry safety under Spark's OWN task retries: a failed task re-invokes
  * the whole partition, so the wrapped call must be idempotent — both
  * wrappers here are stateless pass-throughs around pure/idempotent
  * clients, and the embed stage writes vectors as a column (no external
  * side effect), so re-execution can never double-embed a row into the
  * result: the last successful task attempt's output is the ONLY output
  * Spark commits.
  */
final case class RetryPolicy(
    maxAttempts: Int = 10,
    baseDelayMs: Long = 1000L,
    maxDelayMs: Long = 30000L,
    // injectable for tests; executors use the real clock
    sleeper: Long => Unit = Thread.sleep) extends Serializable {

  require(maxAttempts >= 1)

  /** Run `op`, retrying on exception with capped exponential backoff
    * (delay doubles per attempt). Deterministic — no jitter — so task
    * behavior reproduces exactly.
    *
    * [[InterruptedException]] is NOT retried: it is how Spark cancels a
    * task (kill/speculation/stage abort). Swallowing it would delay
    * cancellation by up to maxAttempts×maxDelay and lose the interrupt
    * flag — restore the flag and rethrow immediately instead. */
  def apply[T](op: => T): T = {
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case e: Exception if attempt < maxAttempts =>
          val delay = math.min(maxDelayMs, baseDelayMs << math.min(attempt - 1, 20))
          try sleeper(delay)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              throw ie
          }
          attempt += 1
        case e: Exception =>
          throw new RuntimeException(
            s"model call failed after $maxAttempts attempts: ${e.getMessage}", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Embedder wrapper: each BATCH call retries as a unit. The inner
  * embedder must be deterministic/idempotent (the [[Embedder]] contract
  * already requires this for Spark task retry), so a mid-batch failure
  * that retries the whole batch produces identical vectors. */
final class RetryingEmbedder(inner: Embedder, policy: RetryPolicy = RetryPolicy())
    extends Embedder {
  override def dims: Int = inner.dims
  override def embed(batch: Seq[String]): Seq[Array[Float]] =
    policy(inner.embed(batch))
}

/** Completion-client wrapper (GetChatCompletionAsync retry surface). */
final class RetryingCompletionClient(inner: CompletionClient,
                                     policy: RetryPolicy = RetryPolicy())
    extends CompletionClient {
  override def complete(systemPrompt: String, userPrompt: String): (String, Int, Int) =
    policy(inner.complete(systemPrompt, userPrompt))
}
