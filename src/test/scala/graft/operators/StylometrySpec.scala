package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for Burrows' Delta: identical profiles read
  * exactly 0 and are the global minimum, the zero-variance refusal,
  * and partition invariance of the decimal-accumulated folds. */
class StylometrySpec extends AnyFunSuite with SparkSuite {

  private val docs = Seq(
    ("A", "x x y z w v"), ("B", "x x y z w v"),
    ("C", "x y y z w v"), ("D", "y y z z v v"))

  test("identical profiles read delta 0 and sit at the global minimum") {
    import spark.implicits._
    val out = Stylometry.burrowsDelta(docs.toDF("src", "text"),
      "text", "src", topWords = 5).collect()
    assert(out.length == 6) // 4 choose 2
    val byPair = out.map(r => ((r.getString(0), r.getString(1)),
      r.getAs[Double]("delta"))).toMap
    assert(byPair(("A", "B")) == 0.0)
    assert(out.head.getString(0) == "A" && out.head.getString(1) == "B",
      "the identical pair must rank first")
    assert(out.tail.forall(_.getAs[Double]("delta") > 0.0))
  }

  test("partition-invariant (decimal ledgers)") {
    import spark.implicits._
    val a = Stylometry.burrowsDelta(docs.toDF("src", "text"),
      "text", "src", topWords = 5).collect()
    val b = Stylometry.burrowsDelta(docs.toDF("src", "text")
      .repartition(5), "text", "src", topWords = 5).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("small vocabulary divides by the ACTUAL marker count, not topWords") {
    import spark.implicits._
    // vocabulary is exactly 5 words; asking for 500 markers must give
    // the same deltas as asking for 5 (pre-r17 the sum was divided by
    // the REQUESTED 500, deflating every delta by 100×)
    val df = docs.toDF("src", "text")
    val want5 = Stylometry.burrowsDelta(df, "text", "src", topWords = 5)
      .collect().map(_.toString).toSeq
    val want500 = Stylometry.burrowsDelta(df, "text", "src", topWords = 500)
      .collect().map(_.toString).toSeq
    assert(want5 == want500)
  }

  test("refuses zero-variance top words and too few sources") {
    import spark.implicits._
    val same = Seq(("A", "x y z w v"), ("B", "x y z w v"),
      ("C", "x y z w v")).toDF("src", "text")
    assert(intercept[IllegalArgumentException] {
      Stylometry.burrowsDelta(same, "text", "src", topWords = 5)
    }.getMessage.contains("variance"))
    val two = Seq(("A", "x y z w v"), ("B", "x x y z w"))
      .toDF("src", "text")
    assert(intercept[IllegalArgumentException] {
      Stylometry.burrowsDelta(two, "text", "src", topWords = 5)
    }.getMessage.contains("sources"))
  }
}
