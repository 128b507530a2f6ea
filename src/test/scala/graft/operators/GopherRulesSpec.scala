package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** [[QualityFilters.gopherRules]] — the non-repetition Gopher battery
  * on adversarial documents the symbol-free synthetic corpus cannot
  * exercise: hashtag/ellipsis symbol ratios, non-alpha word floods,
  * word-length extremes, the stopword requirement, and the conjunctive
  * keep. The q424 gate re-proves hash parity at corpus scale. */
class GopherRulesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def run(docs: (Long, String)*) =
    QualityFilters.gopherRules(
      docs.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  private val fifty = (1 to 50).map(i => s"w$i").mkString(" ")

  test("a clean 50-word doc with stopwords keeps; 49 words fails count") {
    val good = s"the of ${(1 to 48).map(i => s"word$i").mkString(" ")}"
    val out = run(1L -> good, 2L -> s"the of ${(1 to 47).map(i => s"word$i").mkString(" ")}")
    assert(out(1L).getAs[Boolean]("pass_word_count"))
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("pass_word_count"))
    assert(!out(2L).getAs[Boolean]("keep"))
  }

  test("symbol rule: hashtags and ellipsis runs count against words") {
    // 50 words, 6 of them '#' -> 6 symbols / 50 words = 0.12 > 0.1
    val hashy = ((1 to 44).map(i => s"word$i") ++ Seq.fill(6)("#"))
      .mkString(" ") + " the of"
    val dotty = ((1 to 44).map(i => s"word$i") ++ Seq.fill(6)("..."))
      .mkString(" ") + " the of"
    val out = run(1L -> hashy, 2L -> dotty, 3L -> s"$fifty the of")
    assert(!out(1L).getAs[Boolean]("pass_symbol"))
    assert(!out(2L).getAs[Boolean]("pass_symbol"))
    assert(out(3L).getAs[Boolean]("pass_symbol"))
    assert(out(3L).getAs[Double]("symbol_word_ratio") == 0.0)
    // '....' (4 dots) is ONE non-overlapping '...' run
    val four = run(4L -> "....")(4L)
    assert(four.getAs[Double]("symbol_word_ratio") == 1.0)
  }

  test("alpha rule: >=80% of words must contain a letter") {
    val numeric = ((1 to 11).map(_.toString) ++ (1 to 39).map(i => s"w$i"))
      .mkString(" ")  // 39/50 = 0.78 < 0.8
    val mixed = ((1 to 10).map(_.toString) ++ (1 to 40).map(i => s"w$i"))
      .mkString(" ")  // 40/50 = 0.8 passes
    val out = run(1L -> numeric, 2L -> mixed)
    assert(!out(1L).getAs[Boolean]("pass_alpha"))
    assert(out(2L).getAs[Boolean]("pass_alpha"))
    assert(out(2L).getAs[Double]("frac_alpha_words") == 0.8)
  }

  test("word-length band [3,10] on the true word-length mean") {
    val shorty = Seq.fill(50)("ab").mkString(" ")       // mean 2
    val longy = Seq.fill(50)("a" * 11).mkString(" ")    // mean 11
    val out = run(1L -> shorty, 2L -> longy, 3L -> Seq.fill(50)("abcd").mkString(" "))
    assert(!out(1L).getAs[Boolean]("pass_word_len"))
    assert(!out(2L).getAs[Boolean]("pass_word_len"))
    assert(out(3L).getAs[Boolean]("pass_word_len"))
    assert(out(3L).getAs[Double]("mean_word_len") == 4.0)
  }

  test("stopword rule: >=2 DISTINCT of the eight required words") {
    val zero = (1 to 50).map(i => s"w$i").mkString(" ")
    val oneRepeated = s"the the ${(1 to 48).map(i => s"w$i").mkString(" ")}"
    val two = s"the with ${(1 to 48).map(i => s"w$i").mkString(" ")}"
    val out = run(1L -> zero, 2L -> oneRepeated, 3L -> two)
    assert(out(1L).getAs[Long]("n_req_stopwords") == 0L)
    assert(!out(2L).getAs[Boolean]("pass_stopwords")) // distinct, not raw
    assert(out(2L).getAs[Long]("n_req_stopwords") == 1L)
    assert(out(3L).getAs[Boolean]("pass_stopwords"))
  }

  test("empty docs: ratios 0, everything fails, no NaN/nulls") {
    val r = run(1L -> "")(1L)
    assert(r.getAs[Long]("n_words") == 0L)
    assert(r.getAs[Double]("mean_word_len") == 0.0)
    assert(r.getAs[Double]("symbol_word_ratio") == 0.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("real corpus: rules evaluate and keep is the conjunction") {
    val df = QualityFilters.gopherRules(
      graft.Tables.t(spark, sf, "documents"), "doc_id", "text")
    val bad = df.filter(col("keep") && !(col("pass_word_count") &&
      col("pass_word_len") && col("pass_symbol") && col("pass_alpha") &&
      col("pass_stopwords"))).count()
    assert(bad == 0L)
    assert(df.count() == 500L)
  }
}
