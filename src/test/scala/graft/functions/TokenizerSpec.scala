package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {

  // deterministic property sampling (scalatestplus bridge not available
  // offline; seeded Random gives the same coverage reproducibly)
  private val rnd = new scala.util.Random(42)
  private def randomStrings(n: Int): Seq[String] =
    (1 to n).map { _ =>
      val len = rnd.nextInt(60)
      new String(Array.fill(len)((rnd.nextInt(95) + 32).toChar))
    }

  test("encode splits words, numbers, punctuation, whitespace") {
    assert(Tokenizer.encode("hello world") == Seq("hello", " world"))
    assert(Tokenizer.encode("a1!") == Seq("a", "1", "!"))
    assert(Tokenizer.count("What kind of bikes do you have?") == 8)
    assert(Tokenizer.count("") == 0)
    assert(Tokenizer.count(null) == 0)
  }

  test("decode(encode(x)) == x (lossless round trip, 500 random strings)") {
    randomStrings(500).foreach { s =>
      assert(Tokenizer.decode(Tokenizer.encode(s)) == s, s"failed on ${s.take(40)}")
    }
  }

  test("truncateHead keeps first n tokens (T3, ChatService.cs:214-216)") {
    assert(Tokenizer.truncateHead("one two three four", 2) == "one two")
    assert(Tokenizer.truncateHead("one two", 10) == "one two")
  }

  test("truncateTail keeps last n tokens (T4, ChatService.cs:218-224)") {
    assert(Tokenizer.truncateTail("one two three four", 2) == "three four")
  }

  test("truncation never exceeds the token budget (property)") {
    for (s <- randomStrings(200); n <- Seq(0, 1, 3, 10)) {
      assert(Tokenizer.count(Tokenizer.truncateHead(s, n)) <= n)
    }
  }
}
