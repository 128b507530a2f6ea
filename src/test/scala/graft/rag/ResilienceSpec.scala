package graft.rag

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.embed.{Embed, Embedder, HashProjectionEmbedder}

/** Retry/backoff model-client hardening (OpenAiService.cs:97-105 parity)
  * — an injected flaky client fails n times then succeeds, with no
  * double-embedding observable in the committed output. */
/** Fails the first `failures` calls (across all threads), then
  * delegates. Counter is JVM-global (companion object) so local-mode
  * tasks share it and the closure stays serializable. */
private object FlakyState { val calls = new AtomicInteger(0) }
private class FlakyEmbedder(failures: Int) extends Embedder {
  private val inner = HashProjectionEmbedder(dims = 16)
  override def dims: Int = 16
  override def embed(batch: Seq[String]): Seq[Array[Float]] = {
    if (FlakyState.calls.incrementAndGet() <= failures)
      throw new RuntimeException("transient 429")
    inner.embed(batch)
  }
}

class ResilienceSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val noSleep = RetryPolicy(maxAttempts = 10, sleeper = _ => ())

  test("embedder retries through transient failures; vectors correct, no double-embed") {
    FlakyState.calls.set(0)
    val retrying = new RetryingEmbedder(new FlakyEmbedder(failures = 3), noSleep)
    val texts = (1 to 40).map(i => s"document number $i")
    val df = texts.toDF("text").repartition(4)
    val out = Embed.withEmbedding(df, "text", "vec", retrying, batchSize = 8)
      .select("text", "vec").collect()
    // every row present exactly once (no dup from retried batches)
    assert(out.length == texts.length)
    assert(out.map(_.getString(0)).distinct.length == texts.length)
    // and each vector is the deterministic ground truth
    val truth = HashProjectionEmbedder(dims = 16)
    out.foreach { r =>
      assert(r.getSeq[Float](1) == truth.embedOne(r.getString(0)).toSeq,
        s"wrong vector for '${r.getString(0)}'")
    }
    assert(FlakyState.calls.get() > 3, "the failing attempts happened")
  }

  test("retry gives up after maxAttempts and surfaces the cause") {
    val alwaysDown = new Embedder {
      override def dims = 4
      override def embed(batch: Seq[String]) = throw new RuntimeException("boom")
    }
    val retrying = new RetryingEmbedder(alwaysDown, RetryPolicy(maxAttempts = 3, sleeper = _ => ()))
    val e = intercept[RuntimeException](retrying.embed(Seq("x")))
    assert(e.getMessage.contains("after 3 attempts"))
  }

  test("backoff is exponential and capped") {
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val p = RetryPolicy(maxAttempts = 6, baseDelayMs = 100, maxDelayMs = 1000,
      sleeper = delays += _)
    var n = 0
    p { n += 1; if (n < 6) throw new RuntimeException("x"); n }
    assert(delays.toSeq == Seq(100L, 200L, 400L, 800L, 1000L))
  }

  test("completion client retries n failures then succeeds") {
    val calls = new AtomicInteger(0)
    val flaky = new CompletionClient {
      override def complete(s: String, u: String) = {
        if (calls.incrementAndGet() <= 2) throw new RuntimeException("503")
        ("ok", 1, 1)
      }
    }
    val c = new RetryingCompletionClient(flaky, noSleep)
    assert(c.complete("sys", "hi")._1 == "ok")
    assert(calls.get() == 3)
  }

  test("InterruptedException is not retried: flag restored, rethrown at once") {
    Thread.interrupted() // clear any stale flag
    val attempts = new AtomicInteger(0)
    val p = RetryPolicy(maxAttempts = 10, sleeper = _ => ())
    intercept[InterruptedException] {
      p { attempts.incrementAndGet(); throw new InterruptedException("task killed") }
    }
    assert(attempts.get() == 1, "an interrupt must not be counted as a retryable failure")
    assert(Thread.interrupted(), "interrupt flag must be restored") // also clears it
  }

  test("interrupt during backoff sleep aborts the retry loop") {
    Thread.interrupted()
    val attempts = new AtomicInteger(0)
    val p = RetryPolicy(maxAttempts = 10, baseDelayMs = 10,
      sleeper = _ => throw new InterruptedException("interrupted in sleep"))
    intercept[InterruptedException] {
      p { attempts.incrementAndGet(); throw new RuntimeException("transient") }
    }
    assert(attempts.get() == 1)
    assert(Thread.interrupted())
  }

  test("MaxEmbeddingTokens caps the embed input (appsettings.json:17)") {
    // distinct tokens — truncation must change the (normalized) vector
    val long = (1 to 100).map(i => s"tok$i").mkString(" ")
    val df = Seq(long).toDF("text")
    val emb = HashProjectionEmbedder(dims = 16)
    val capped = Embed.withEmbedding(df, "text", "vec", emb, maxInputTokens = Some(5))
      .select("vec").head().getSeq[Float](0)
    val expected = emb.embedOne(graft.functions.Tokenizer.truncateHead(long, 5))
    assert(capped == expected.toSeq)
    assert(capped != emb.embedOne(long).toSeq, "cap must change an over-long input")
  }
}
