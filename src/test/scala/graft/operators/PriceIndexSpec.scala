package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Proof obligations for the bilateral indices: hand-computed L/P/F
  * on a two-item basket, the matched-model discipline (entry/exit
  * items counted but excluded), the Laspeyres≥Paasche direction under
  * a planted substitution pattern, partition invariance, refusals. */
class PriceIndexSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // item A: price 10 -> 20 (cents 1000/2000), qty 5 -> 2
  // item B: price 10 -> 10, qty 5 -> 8
  // p1q0: A 20*5 + B 10*5 = 150; p0q0 = 100 -> L = 1.5
  // p1q1: A 20*2 + B 10*8 = 120; p0q1: A 10*2 + B 10*8 = 100 -> P = 1.2
  private def rows = Seq(
    ("A", 5000L, 5L, 0), ("B", 5000L, 5L, 0),
    ("A", 4000L, 2L, 1), ("B", 8000L, 8L, 1))
    .toDF("item", "cents", "qty", "per")

  test("hand-computed Laspeyres/Paasche/Fisher on a two-item basket") {
    val out = PriceIndex.bilateral(rows, "item", "cents", "qty",
      col("per") === 0, col("per") === 1).head()
    assert(out.getAs[Long]("n_matched") == 2L)
    assert(out.getAs[Double]("laspeyres") == 1.5)
    assert(out.getAs[Double]("paasche") == 1.2)
    assert(out.getAs[Double]("fisher") ==
      math.rint(math.sqrt(1.5 * 1.2) * 1e6) / 1e6)
    // substitution away from the price riser: L >= F >= P
    assert(out.getAs[Double]("laspeyres") >= out.getAs[Double]("fisher"))
    assert(out.getAs[Double]("fisher") >= out.getAs[Double]("paasche"))
  }

  test("matched-model discipline: entry/exit items counted, not indexed") {
    val withChurn = rows.union(Seq(
      ("EXIT", 1000L, 1L, 0), ("ENTRY", 9000L, 1L, 1))
      .toDF("item", "cents", "qty", "per"))
    val out = PriceIndex.bilateral(withChurn, "item", "cents", "qty",
      col("per") === 0, col("per") === 1).head()
    assert(out.getAs[Long]("n_matched") == 2L)
    assert(out.getAs[Long]("n_only_base") == 1L)
    assert(out.getAs[Long]("n_only_curr") == 1L)
    // indices unchanged by the churn rows
    assert(out.getAs[Double]("laspeyres") == 1.5)
    assert(out.getAs[Double]("paasche") == 1.2)
  }

  test("pure inflation with a fixed basket: all three indices agree") {
    val pure = Seq(("A", 1000L, 4L, 0), ("B", 3000L, 2L, 0),
      ("A", 1300L, 4L, 1), ("B", 3900L, 2L, 1))
      .toDF("item", "cents", "qty", "per")
    val out = PriceIndex.bilateral(pure, "item", "cents", "qty",
      col("per") === 0, col("per") === 1).head()
    assert(out.getAs[Double]("laspeyres") == 1.3)
    assert(out.getAs[Double]("paasche") == 1.3)
    assert(out.getAs[Double]("fisher") == 1.3)
  }

  test("partition-invariant and refuses an empty match set") {
    val a = PriceIndex.bilateral(rows, "item", "cents", "qty",
      col("per") === 0, col("per") === 1).head().toString
    val b = PriceIndex.bilateral(rows.repartition(7), "item", "cents", "qty",
      col("per") === 0, col("per") === 1).head().toString
    assert(a == b)
    val disjoint = Seq(("A", 1000L, 1L, 0), ("B", 1000L, 1L, 1))
      .toDF("item", "cents", "qty", "per")
    assert(intercept[IllegalArgumentException] {
      PriceIndex.bilateral(disjoint, "item", "cents", "qty",
        col("per") === 0, col("per") === 1)
    }.getMessage.contains("no item"))
  }
}
