package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the gains table: a perfect ranker's gains,
  * a random-ish score's lift ≈ 1, exact cell arithmetic, the floor
  * decile rule on a non-divisible n, and the positives guard. */
class LiftCurveSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("a perfect ranker captures all positives in the top deciles") {
    // 100 rows, 20 positives, score = label: top 2 deciles take all
    val rows = (0 until 100).map(i => (i.toLong, if (i < 20) 1.0 else 0.0,
      i < 20))
    val out = LiftCurve.gainsTable(rows.toDF("id", "s", "y"), "id", "s", "y")
      .collect()
    assert(out(0).getAs[Double]("gain") == 0.5)
    assert(out(1).getAs[Double]("gain") == 1.0)
    assert(out(0).getAs[Double]("lift") == 5.0) // 100%/20% base
    assert(out(9).getAs[Double]("lift") == 1.0) // everything = base
    assert(out.map(_.getAs[Long]("pos")).sum == 20L)
  }

  test("floor decile rule on non-divisible n matches hand assignment") {
    // n = 7, buckets = 3: sizes by floor((rn-1)*3/7): 0,0,0 | 1,1 | 2,2
    val rows = (0 until 7).map(i => (i.toLong, (10 - i).toDouble, i == 0))
    val out = LiftCurve.gainsTable(rows.toDF("id", "s", "y"), "id", "s", "y",
      buckets = 3).collect()
    assert(out.map(r => (r.getAs[Int]("decile"), r.getAs[Long]("n"))).toSeq ==
      Seq((0, 3L), (1, 2L), (2, 2L)))
  }

  test("no positives fails loudly; ranking ties break by id") {
    val none = (0 until 20).map(i => (i.toLong, 0.5, false))
    intercept[IllegalArgumentException] {
      LiftCurve.gainsTable(none.toDF("id", "s", "y"), "id", "s", "y")
    }
    // all scores tied: decile assignment = id order, deterministic
    val tied = (0 until 20).map(i => (i.toLong, 0.5, i < 4))
    val out = LiftCurve.gainsTable(tied.toDF("id", "s", "y"), "id", "s", "y",
      buckets = 5).collect()
    assert(out(0).getAs[Long]("pos") == 4L) // ids 0-3 land in bucket 0
  }
}
