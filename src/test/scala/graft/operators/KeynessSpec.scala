package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for Dunning G² keyness: a planted over-used word
  * ranks first for its source, shared vocabulary scores ~0 and never
  * outranks it, the direction filter keeps under-used words out, the
  * min-count floor holds, and the folds are partition-invariant. */
class KeynessSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // two sources share "the data spark" uniformly; source A over-uses
  // "subscribe", B over-uses "invoice"
  private def docs = Seq(
    ("A", "the data spark subscribe subscribe subscribe subscribe subscribe"),
    ("A", "the data spark subscribe subscribe subscribe subscribe subscribe"),
    ("B", "the data spark invoice invoice invoice invoice invoice"),
    ("B", "the data spark invoice invoice invoice invoice invoice"))
    .toDF("src", "text")

  test("planted marker words rank first for their sources") {
    val out = Keyness.keynessG2(docs, "src", "text", k = 3, minCount = 2)
      .collect()
    val top = out.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[String]("src") -> r.getAs[String]("word")).toMap
    assert(top == Map("A" -> "subscribe", "B" -> "invoice"))
    // the marker is exclusive, so its n_rest is 0 and G2 is large
    val subs = out.find(r => r.getAs[String]("word") == "subscribe").get
    assert(subs.getAs[Long]("n_rest") == 0L)
    assert(subs.getAs[Double]("g2") > 10.0)
  }

  test("uniformly shared words score ~0 and never outrank the marker") {
    val out = Keyness.keynessG2(docs, "src", "text", k = 5, minCount = 1)
      .collect()
    out.filter(r => Seq("the", "data", "spark")
        .contains(r.getAs[String]("word")))
      .foreach { r =>
        assert(r.getAs[Double]("g2") < 1.0, r.toString)
        assert(r.getAs[Int]("rank") > 1, r.toString)
      }
  }

  test("direction filter: a word UNDER-used in a source is not its keyword") {
    val out = Keyness.keynessG2(docs, "src", "text", k = 5, minCount = 1)
      .collect()
    // "invoice" never appears in A's rows at all; but also check a word
    // present-yet-under-used: plant one stray "subscribe" in B
    val withStray = docs.union(
      Seq(("B", "subscribe and more words here")).toDF("src", "text"))
    val stray = Keyness.keynessG2(withStray, "src", "text", k = 10,
      minCount = 1).collect()
      .filter(r => r.getAs[String]("src") == "B" &&
        r.getAs[String]("word") == "subscribe")
    assert(stray.isEmpty, "an under-used word must not surface as a keyword")
    assert(out.forall(r => r.getAs[Long]("n_in") >= 1L))
  }

  test("minCount floors the vocabulary and the refusal fires on empty corpora") {
    val out = Keyness.keynessG2(docs, "src", "text", k = 5, minCount = 6)
      .collect()
    assert(out.map(_.getAs[String]("word")).toSet == Set("subscribe", "invoice"),
      "only the 10-count markers clear a floor of 6")
    assert(intercept[IllegalArgumentException] {
      Keyness.keynessG2(Seq.empty[(String, String)].toDF("src", "text"),
        "src", "text")
    }.getMessage.contains("tokens"))
  }

  test("partition-invariant (exact censuses, fixed closing tree)") {
    val a = Keyness.keynessG2(docs, "src", "text", k = 5, minCount = 1)
      .collect().map(_.toString).toSeq
    val b = Keyness.keynessG2(docs.repartition(7), "src", "text", k = 5,
      minCount = 1).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
