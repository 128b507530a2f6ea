package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Trainable bigram-LM surprisal: hand-computed Laplace bits, the
  * floating-log cross-check, and the word-salad separation that the
  * context-free unigram score cannot make. */
class NgramLmSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  // reference slice: "a b" ×3 and "a c b a" — counts:
  //   bigrams: (a,b)=3, (a,c)=1, (c,b)=1, (b,a)=1 ; contexts: a=4, c=1, b=1
  //   vocab V = 3 (a, b, c)
  private lazy val model = NgramLm.train(
    Seq("a b", "a b", "a b", "a c b a").toDF("text"), "text")

  private def bits(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x)

  private def scored(rows: (Long, String)*): Map[Long, (Long, Long, Double)] =
    NgramLm.score(rows.toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("hand-computed Laplace bits: seen, unseen-transition, unseen-context") {
    val got = scored((1L, "a b"), (2L, "a a"), (3L, "z q"), (4L, "c b"))
    // s(b|a) = bits(4+3) - bits(3+1) = 3-3 = 0
    assert(got(1L) == (1L, 0L, 0.0))
    // unseen transition in known context: s(a|a) = bits(7) - bits(0+1) = 3-1 = 2
    assert(got(2L) == (1L, 2L, 2.0))
    // unseen context: s(q|z) = bits(0+3) - bits(1) = 2-1 = 1
    assert(got(3L) == (1L, 1L, 1.0))
    // s(b|c) = bits(1+3) - bits(1+1) = 3-2 = 1
    assert(got(4L) == (1L, 1L, 1.0))
  }

  test("bits match the floating-point floor(log2)+1 on every scored pair") {
    // the bin-length idiom IS floor(log2 x)+1 for x >= 1 — verify across
    // a count range wide enough to cross several bucket boundaries
    (1L to 1025L).foreach { x =>
      assert(bits(x) == math.floor(math.log(x.toDouble) / math.log(2.0)).toLong + 1)
    }
  }

  test("word salad from common words scores high; in-domain prose scores 0") {
    // every WORD is corpus-common, every TRANSITION except (a,b) is not:
    // unigram rarity cannot separate these, the conditional model must
    val got = scored((1L, "a b a b a b"), (2L, "b b c c a a"))
    assert(got(1L)._3 < got(2L)._3)
  }

  test("short docs: <2 tokens scores 0 over 0 bigrams") {
    val got = scored((1L, "a"), (2L, ""), (3L, "  "))
    assert(got(1L) == (0L, 0L, 0.0))
    assert(got(2L) == (0L, 0L, 0.0))
    assert(got(3L) == (0L, 0L, 0.0))
  }

  test("model normalizes: sum of c12 over w2 equals the context count") {
    val c12 = model.bigrams.groupBy("w1").sum("c12").as[(String, Long)].collect().toMap
    val c1 = model.contexts.as[(String, Long)].collect().toMap
    assert(c12 == c1)
    assert(model.vocab.as[Long].head() == 3L)
  }
}
