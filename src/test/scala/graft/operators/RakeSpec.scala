package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for RAKE: phrase carving at stopword/punctuation
  * boundaries, the deg/freq scoring arithmetic on the paper's own
  * shape (long-phrase words outrank equal-frequency solo words),
  * occurrence counting, the maxPhraseWords cap, and determinism. */
class RakeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("phrases split on stopwords AND punctuation; scores are deg/freq sums") {
    // "deep learning" appears twice as a phrase; "model" solo twice.
    // deg(deep)=4 (two 2-phrases), freq=2 -> 2.0; same for learning;
    // score(deep learning)=4.0. deg(model)=freq(model)=2 -> 1.0.
    val docs = Seq(
      (1L, "deep learning is the model"),
      (2L, "model of deep learning")).toDF("id", "text")
    val out = Rake.keywords(docs, "id", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("deep learning").getAs[Double]("score") == 4.0)
    assert(out("deep learning").getAs[Long]("n_occurrences") == 2L)
    assert(out("model").getAs[Double]("score") == 1.0)
    assert(!out.contains("is") && !out.contains("the") && !out.contains("of"))
  }

  test("punctuation carves phrases exactly like stopwords") {
    val docs = Seq((1L, "gradient descent, stochastic approximation"))
      .toDF("id", "text")
    val phrases = Rake.keywords(docs, "id", "text").collect()
      .map(_.getString(0)).toSet
    assert(phrases == Set("gradient descent", "stochastic approximation"))
  }

  test("maxPhraseWords drops over-long runs entirely (no truncation)") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("id", "text")
    val all = Rake.keywords(docs, "id", "text", maxPhraseWords = 4).collect()
    assert(all.isEmpty) // the single 5-word run is dropped, not clipped
    val kept = Rake.keywords(docs, "id", "text", maxPhraseWords = 5).collect()
    assert(kept.head.getString(0) == "alpha beta gamma delta epsilon")
    assert(kept.head.getAs[Long]("n_words") == 5L)
  }

  test("deterministic across partition layouts on the real corpus") {
    val docs = graft.Tables.t(spark, sf, "documents")
    val a = Rake.keywords(docs.repartition(3), "doc_id", "text")
      .collect().map(_.toString).toSeq
    val b = Rake.keywords(docs.repartition(13, $"lang"), "doc_id", "text")
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
