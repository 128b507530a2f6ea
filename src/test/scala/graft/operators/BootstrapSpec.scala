package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class BootstrapSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], b: Int = 200) =
    Bootstrap.poissonCi(rows.toDF("g", "id", "x"), "g", "x", "id", b = b)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  test("point mean is exact; CI brackets it and is ordered") {
    val rows = (1L to 100L).map(i => ("g", i, i % 17))
    val m = run(rows)
    val (n, mean, lo, hi) = m("g")
    assert(n == 100L)
    assert(mean == rows.map(_._3).sum.toDouble / 100)
    assert(lo <= mean && mean <= hi && lo < hi)
  }

  test("a constant column has a degenerate CI at the constant") {
    val m = run((1L to 50L).map(i => ("c", i, 42L)))
    assert(m("c") == ((50L, 42.0, 42.0, 42.0)))
  }

  test("CI width shrinks roughly like 1/sqrt(n) as the group grows") {
    val wide = run((1L to 60L).map(i => ("g", i, (i * 7919) % 100)))
    val narrow = run((1L to 960L).map(i => ("g", i, (i * 7919) % 100)))
    val w1 = wide("g")._4 - wide("g")._3
    val w2 = narrow("g")._4 - narrow("g")._3
    // 16x the data: expect ~4x narrower; allow slack for resampling noise
    assert(w2 < w1 / 2, s"width $w1 -> $w2 did not shrink")
  }

  test("deterministic across partitionings and repeated runs") {
    val rows = (1L to 300L).map(i => (s"g${i % 2}", i, i % 23))
    val df = rows.toDF("g", "id", "x")
    val a = Bootstrap.poissonCi(df.coalesce(1), "g", "x", "id")
      .orderBy("g").collect().toSeq
    val b = Bootstrap.poissonCi(df.repartition(13), "g", "x", "id")
      .orderBy("g").collect().toSeq
    assert(a == b)
  }

  test("weights reproduce Poisson(1) moments on the hash grid") {
    // mean weight across (row, replicate) must be ~1 (the scheme's
    // defining property: E[w] = 1 keeps replicate totals unbiased)
    val rows = (1L to 500L).map(i => ("g", i, 1L))
    val m = run(rows, b = 100)
    // with x = 1 the point mean is 1 and every replicate mean is exactly 1
    assert(m("g")._2 == 1.0 && m("g")._3 == 1.0 && m("g")._4 == 1.0)
  }
}
