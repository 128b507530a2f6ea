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

  test("merges never fire across token boundaries") {
    import spark.implicits._
    // after merging (t,h) the word 'the' is 't~h e'; a boundary-blind
    // replace of the next merge 'h e' would corrupt it to 't~h~e',
    // applying a merge never learned for (t~h, e)
    val toks = Seq(("t~h e", 1L), ("b c~x", 1L)).toDF("toks", "cnt")
    val out = BpeTrainer.applyMerges(toks, "toks", Seq((1, "h e"), (2, "b c")))
      .select("toks").as[String].collect().toSet
    assert(out == Set("t~h e", "b c~x"))
    // and the anchored replace still merges real whole-token occurrences
    val real = BpeTrainer.applyMerges(
      Seq(("h e h e l", 1L)).toDF("toks", "cnt"), "toks", Seq((1, "h e")))
      .select("toks").as[String].collect().head
    assert(real == "h~e h~e l") // adjacent run: second pass catches occurrence 2
  }

  test("cross-boundary pairs are counted and applied consistently (end-to-end)") {
    // merge 1: (t,h) c=12. 'the' becomes 't~h e', whose ONLY pair is
    // (t~h, e) — counting (zip over split tokens) sees that. Merge 2:
    // (h,e) c=5 from 'xhe' (ties (x,h) c=5, lexicographic) must then
    // apply ONLY to 'x h e', not inside 't~h e' (which contains the
    // substring "h e" across its token boundary).
    val words = freqs("th" -> 10L, "the" -> 2L, "xhe" -> 5L)
    val (merges, finalWords) = BpeTrainer.train(words, 2)
    assert(merges.map(_._2) == Seq("t h", "h e"))
    val out = finalWords.select("toks").collect().map(_.getString(0)).toSet
    assert(out == Set("t~h", "t~h e", "x h~e"))
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
