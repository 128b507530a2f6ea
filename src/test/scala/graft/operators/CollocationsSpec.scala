package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class CollocationsSpec extends AnyFunSuite with SparkSuite {

  private def pmi(texts: Seq[String], minCount: Long = 1L) = {
    import spark.implicits._
    Collocations.pmiBigrams(texts.toDF("text"), "text", minCount)
  }

  test("counts and lift match the hand-computed definition") {
    // corpus: "a b" ×3, "a c" ×1 → T=8 tokens, B=4 bigrams
    // n(a)=4, n(b)=3, n(c)=1; n12(a,b)=3, n12(a,c)=1
    // lift(a,b) = (3·8·8)/(4·4·3) = 4.0 ; lift(a,c) = (1·8·8)/(4·4·1) = 4.0
    val got = pmi(Seq("a b", "a b", "a b", "a c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(5)))).toMap
    assert(got(("a", "b")) == (3L, 4.0))
    assert(got(("a", "c")) == (1L, 4.0))
    assert(got.size == 2)
  }

  test("lift > 1 for associated pairs, < 1 for anti-associated") {
    // "x y" always together; "p", "q" each frequent but never adjacent
    // (separated by filler) → (x,y) lift high, (p,filler) lift ~1
    val docs = Seq.fill(10)("x y") ++ Seq.fill(10)("p z q")
    val got = pmi(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(5))).toMap
    assert(got(("x", "y")) > 1.0)
    assert(!got.contains(("p", "q"))) // never adjacent → no bigram at all
  }

  test("minCount filters rare bigrams but their mass still counts in totals") {
    val docs = Seq.fill(5)("a b") :+ "a c"
    val all = pmi(docs, minCount = 1L).collect()
    val cut = pmi(docs, minCount = 5L).collect()
    assert(all.length == 2 && cut.length == 1)
    // the (a,c) bigram still contributes to B: lift(a,b) identical in both
    val liftAll = all.find(r => r.getString(1) == "b").get.getDouble(5)
    val liftCut = cut.head.getDouble(5)
    assert(liftAll == liftCut)
  }

  test("empty tokens from repeated separators never form bigrams") {
    val got = pmi(Seq("a  b", "a   b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b")))
  }

  test("single-word and empty documents contribute no bigrams, tokens still count") {
    // "solo" adds 1 token to T but no bigram; changes every lift's T²
    val base = pmi(Seq("a b", "a b")).collect().head.getDouble(5)
    val plus = pmi(Seq("a b", "a b", "solo", "")).collect()
      .find(r => r.getString(1) == "b").get.getDouble(5)
    // T goes 4→5 with B fixed at 2, n unchanged: lift scales by 25/16
    assert(math.abs(plus / base - 25.0 / 16.0) < 1e-12)
  }

  test("partitioning-invariant (exact counts, pinned double expression)") {
    val docs = (1 to 200).map(i => s"w${i % 7} w${i % 5} w${i % 3} w${i % 7}")
    import spark.implicits._
    val one = Collocations.pmiBigrams(docs.toDF("text").coalesce(1), "text", 2)
      .orderBy("w1", "w2").collect().toSeq
    val many = Collocations.pmiBigrams(docs.toDF("text").repartition(13), "text", 2)
      .orderBy("w1", "w2").collect().toSeq
    assert(one == many)
  }
}
