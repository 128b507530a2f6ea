package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** n-gram overlap decontamination: a training doc sharing any word
  * n-gram with the benchmark set is flagged with the count of distinct
  * shared n-grams; disjoint docs are untouched. */
class DecontaminateSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely unrelated training text about spark engines"),
    (3L, "the quick brown cat sat still")).toDF("id", "text")
  private val bench = Seq(
    (100L, "benchmark asks about the quick brown fox today")).toDF("id", "text")

  test("flags docs sharing 3-grams with the benchmark, counts distinct shared") {
    val out = Decontaminate.sharedNgrams(train, bench, "id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the quick brown" and "quick brown fox"; doc 3 only
    // "the quick brown"; doc 2 shares nothing
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("repeated shared n-gram in one doc counts once (distinct semantics)") {
    val t = Seq((1L, "alpha beta gamma and alpha beta gamma")).toDF("id", "text")
    val b = Seq((9L, "alpha beta gamma")).toDF("id", "text")
    val out = Decontaminate.sharedNgrams(t, b, "id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L)
  }

  test("clean corpus: empty result, usable as an anti-join filter") {
    val t = Seq((1L, "one two three"), (2L, "four five six")).toDF("id", "text")
    val b = Seq((9L, "seven eight nine")).toDF("id", "text")
    val flagged = Decontaminate.sharedNgrams(t, b, "id", "text", n = 3)
    assert(flagged.count() == 0)
    assert(t.join(flagged, Seq("id"), "left_anti").count() == 2)
  }

  test("docs shorter than n words produce no shingles and never match") {
    val t = Seq((1L, "too short")).toDF("id", "text")
    val b = Seq((9L, "too short")).toDF("id", "text")
    assert(Decontaminate.sharedNgrams(t, b, "id", "text", n = 3).count() == 0)
  }
}
