package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Gopher-style repetition signals, hand-computed. */
class QualityFiltersSpec extends AnyFunSuite with SparkSuite {

  test("unigramRarity: hand-computed buckets; rare words score higher") {
    import spark.implicits._
    // corpus: "a" ×4, "b" ×2, "rare" ×1, total 7 occurrences -> tb=3
    // rarity: a -> 3-3=0, b -> 3-2=1, rare -> 3-1=2
    val docs = Seq(
      (1L, "a a a a"), (2L, "b b rare"), (3L, "")).toDF("doc_id", "text")
    val got = QualityFilters.unigramRarity(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 0L, 0.0),            // 4 common words, zero rarity
      (2L, 3L, 4L, 1.333333),       // 1+1+2, mean rounded to 6dp
      (3L, 0L, 0L, 0.0)))           // empty doc scores 0
  }

  import spark.implicits._

  private def signals(rows: (Long, String)*): Map[Long, (Double, Double)] =
    QualityFilters.repetitionSignals(rows.toDF("id", "text"), "id", "text")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("duplicate-word fraction and top-bigram coverage, hand-checked") {
    val out = signals(
      (1L, "a a a b"), // 4 words, 2 distinct -> dup 0.5; bigrams: "a a"x2, "a b" -> 2/3
      (2L, "x y z w")) // all distinct -> dup 0; every bigram unique -> 1/3
    assert(out(1L)._1 == 0.5)
    assert(math.abs(out(1L)._2 - 2.0 / 3.0) < 1e-12)
    assert(out(2L)._1 == 0.0)
    assert(math.abs(out(2L)._2 - 1.0 / 3.0) < 1e-12)
  }

  test("degenerate inputs: empty text and single word") {
    val out = signals((1L, ""), (2L, "solo"))
    assert(out(1L) == (0.0, 0.0)) // no words, no bigrams
    assert(out(2L) == (0.0, 0.0)) // one word: no repeats, no bigrams
  }

  test("pure repetition maxes both signals") {
    val out = signals((1L, "spam spam spam spam spam"))
    assert(out(1L)._1 == 1.0 - 1.0 / 5.0)
    assert(out(1L)._2 == 1.0) // the only bigram covers everything
  }
}
