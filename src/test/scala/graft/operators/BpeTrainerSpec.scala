package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class BpeTrainerSpec extends AnyFunSuite with SparkSuite {

  private def freqs(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("w", "cnt")
  }

  test("learns the dominant pair first, then builds on the merged token") {
    // "ab" appears 10x in 'abab', 5x in 'abc' => pair (a,b) dominates;
    // after merging, (a~b, a~b) inside 'abab' is next
    val words = freqs("abab" -> 10L, "abc" -> 5L)
    val (merges, _) = BpeTrainer.train(words, 2)
    assert(merges.map(_._2) == Seq("a b", "a~b a~b"))
  }

  test("tie-break is lexicographic on the pair string") {
    // 'xy' and 'xz' both appear exactly 3 times
    val words = freqs("xy" -> 3L, "xz" -> 3L)
    val (merges, _) = BpeTrainer.train(words, 1)
    assert(merges.head._2 == "x y") // 'x y' < 'x z'
  }

  test("merge applies left-to-right non-overlapping (aaa -> (aa) a)") {
    val words = freqs("aaa" -> 1L)
    val (merges, finalWords) = BpeTrainer.train(words, 1)
    assert(merges.head._2 == "a a")
    val toks = finalWords.select("toks").collect().head.getString(0)
    assert(toks == "a~a a")
  }

  test("applyMerges reproduces training's final representation") {
    val words = freqs("abab" -> 10L, "abc" -> 5L, "ba" -> 2L)
    val (merges, finalWords) = BpeTrainer.train(words, 3)
    val replayed = BpeTrainer.applyMerges(
      words.select(concat_ws(" ", split(col("w"), "")).as("toks"), col("cnt")),
      "toks", merges)
    assert(replayed.select("toks", "cnt").collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      finalWords.select("toks", "cnt").collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("training compresses: tokens per word decrease monotonically in merges") {
    val docs = graft.Tables.t(spark, sf, "documents").limit(200)
    val words = BpeTrainer.wordFreqs(docs, "text")
    def totalTokens(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(size(split(col("toks"), " ")) * col("cnt"))).head().getLong(0)
    val base = words.select(concat_ws(" ", split(col("w"), "")).as("toks"), col("cnt"))
    val (m4, w4) = BpeTrainer.train(words, 4)
    val (m8, w8) = BpeTrainer.train(words, 8)
    assert(m4 == m8.take(4)) // deterministic prefix property
    val t0 = totalTokens(base)
    val t4 = totalTokens(w4)
    val t8 = totalTokens(w8)
    assert(t0 > t4 && t4 > t8, s"no compression: $t0 -> $t4 -> $t8")
  }
}
