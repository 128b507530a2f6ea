package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Real-BPE codec (T1-T4 with a learned vocabulary) + trainer. The
  * budget-semantics parity with the lexer fallback is what makes the
  * codec swappable behind [[TokenCodec]] (ChatService.cs:183-192). */
class BpeSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def randomStrings(n: Int): Seq[String] =
    (1 to n).map { _ =>
      val len = rnd.nextInt(80)
      new String(Array.fill(len)((rnd.nextInt(95) + 32).toChar))
    }

  // A tiny trained codec: morphological corpus where sub-word structure
  // (stem + suffix) is learnable.
  private lazy val tiny: Bpe = {
    val stems = Seq("walk", "talk", "jump", "look", "work")
    val sufs = Seq("", "s", "ed", "ing")
    val words = for (s <- stems; f <- sufs) yield s + f
    val corpus = (1 to 50).flatMap(_ => words)
      .map(w => (" " + w, 1L))
      .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
    new Bpe(BpeTrainer.learnMerges(corpus, numMerges = 64))
  }

  test("decode(encode(x)) == x for arbitrary ASCII (byte fallback, no OOV)") {
    randomStrings(500).foreach { s =>
      assert(tiny.decode(tiny.encodeIds(s)) == s, s"failed on ${s.take(40)}")
    }
  }

  test("decode(encode(x)) == x across unicode (multibyte UTF-8)") {
    val samples = Seq("héllo wörld", "数据处理引擎", "naïve café — résumé",
      "emoji 😀 mix", "tab\tand\nnewline", "ελληνικά русский")
    samples.foreach(s => assert(tiny.decode(tiny.encodeIds(s)) == s))
  }

  test("training learns sub-word merges: stems compress to few tokens") {
    // " walk" appears in 4 surface forms — BPE must merge it into one
    // token, so inflected forms cost stem + suffix, not one id per byte.
    assert(tiny.count(" walking") <= 3)
    assert(tiny.count(" walked") <= 3)
    // and a trained codec strictly beats byte-per-token on its corpus
    assert(tiny.count(" walking") < " walking".length)
  }

  test("unseen words still encode (bytes), seen words are cheaper") {
    val seen = tiny.count(" walks")
    val unseen = tiny.count(" xqzvb")
    assert(seen < unseen)
  }

  test("shipped vocabulary resource loads and round-trips") {
    val b = Bpe.default
    assert(b.vocabSize > 256, "resource should carry learned merges")
    val s = "the customer table scan is fast"
    assert(b.decode(b.encodeIds(s)) == s)
    // learned English-ish merges: far fewer tokens than bytes
    assert(b.count(s) < s.length / 2)
  }

  test("budget semantics parity with the lexer (T3/T4 contract)") {
    val text = " walking talking jumping looking working"
    for (codec <- Seq[TokenCodec](Tokenizer, tiny, Bpe.default); n <- Seq(0, 1, 3, 100)) {
      val head = codec.truncateHead(text, n)
      assert(codec.count(head) <= n, s"head budget violated: $codec $n")
      assert(text.startsWith(head), "head truncation must be a prefix")
      val tail = codec.truncateTail(text, n)
      assert(text.replaceFirst("^\\s+", "").endsWith(tail) || tail.isEmpty,
        "tail truncation must be a (stripped) suffix")
    }
  }

  test("merge persistence round-trips through render/parse") {
    val merges = Array((32, 119), (256, 97))
    val parsed = BpeTrainer.parseMerges(
      BpeTrainer.render(merges).linesIterator)
    assert(parsed.toSeq == merges.toSeq)
  }

  test("training is deterministic") {
    val corpus = Seq((" aaab", 5L), (" aab", 3L), (" abc", 2L))
    val m1 = BpeTrainer.learnMerges(corpus, 10)
    val m2 = BpeTrainer.learnMerges(corpus, 10)
    assert(m1.toSeq == m2.toSeq)
    assert(m1.nonEmpty)
  }

  test("T5 proportional trim runs identically shaped under both codecs") {
    import graft.rag.TokenBudget
    val conv = (1 to 60).map(i => s"turn $i of the conversation").mkString(" ")
    val rag = (1 to 60).map(i => s"retrieved fact number $i").mkString(" ")
    for (codec <- Seq[TokenCodec](Tokenizer, Bpe.default)) {
      val (aug, prompt) = TokenBudget.buildPrompts("what?", conv, rag,
        maxCompletionTokens = 300, codec = codec)
      assert(prompt.endsWith("\nwhat?"), "user prompt is never trimmed")
      assert(rag.startsWith(aug), "rag keeps its head")
      assert(aug.length < rag.length, s"over budget must trim rag under $codec")
      // trimmed conversation is a contiguous token-slice of the original
      val trimmedConv = prompt.stripSuffix("\nwhat?")
      assert(conv.contains(trimmedConv), s"conversation slice corrupt under $codec")
      assert(trimmedConv.length < conv.length, s"over budget must trim conv under $codec")
    }
  }
}
