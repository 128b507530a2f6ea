package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ReadabilitySpec extends AnyFunSuite with SparkSuite {

  test("hand-computed Flesch/FK on one document") {
    import spark.implicits._
    // "aa bb. cc": words = 3, sentences = 1 ("."), syllables = 1 ("aa")
    val r = Readability.fleschPerGroup(
      Seq(("g", "aa bb. cc")).toDF("src", "text"), "src", "text").head()
    assert(r.getLong(1) == 1 && r.getLong(2) == 3 &&
      r.getLong(3) == 1 && r.getLong(4) == 1)
    val ease = 206.835 - 1.015 * 3.0 - 84.6 * (1.0 / 3.0)
    val grade = 0.39 * 3.0 + 11.8 * (1.0 / 3.0) - 15.59
    assert(math.abs(r.getDouble(5) - ease) < 1e-6)
    assert(math.abs(r.getDouble(6) - grade) < 1e-6)
  }

  test("punctuation-free documents floor at one sentence; vowel runs split on consonants") {
    import spark.implicits._
    // "reading easy": syllables = ea, i (reading: e-a? 'ea' one run + 'i') —
    // r[ea]d[i]ng [ea]s[y] → runs: ea, i, ea, y = 4
    val r = Readability.fleschPerGroup(
      Seq(("g", "reading easy")).toDF("src", "text"), "src", "text").head()
    assert(r.getLong(3) == 1, "sentence floor")
    assert(r.getLong(4) == 4, "vowel runs")
  }

  test("aggregate form weights long documents; groups independent") {
    import spark.implicits._
    val df = Seq(("a", "go. go."), ("a", "no"), ("b", "hi")).toDF("s", "t")
    val out = Readability.fleschPerGroup(df, "s", "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a: words 2+1, sentences 2+1, syllables o,o,o = 3
    assert(out("a") == ((3L, 3L, 3L)))
    assert(out("b") == ((1L, 1L, 1L)))
  }
}
