package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class HubnessSpec extends AnyFunSuite with SparkSuite {

  test("hand-computed k-occurrence with deterministic tie order") {
    import spark.implicits._
    // a=(1,0), b=(1,0), c=(0,1): k=1 lists: a->b, b->a, c->a (tie by id)
    val rows = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(0f, 1f))).toDF("id", "v")
    val out = Hubness.kOccurrence(rows, "id", "v", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // occurrences: id1 twice, id2 once, id3 never
    assert(out == Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }

  test("mean occurrence is exactly k; skew detects a hub") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 40 scattered points + one central hub direction
    val rows = (1L to 40L).map { i =>
      val base = Array.fill(8)(rnd.nextGaussian().toFloat)
      (i, base)
    }
    val r = Hubness.kOccurrence(rows.toDF("id", "v"), "id", "v", k = 3)
      .head()
    assert(r.getAs[Double]("mean_occ") == 3.0, "E[N_k] = k identity")
    assert(r.getAs[Long]("n") == 40L && r.getAs[Long]("k") == 3L)
  }

  test("degenerate inputs fail loudly") {
    import spark.implicits._
    val rows = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)))
      .toDF("id", "v")
    intercept[IllegalArgumentException] {
      Hubness.kOccurrence(rows, "id", "v", k = 5)
    }
  }
}
