package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class AutocorrSpec extends AnyFunSuite with SparkSuite {

  test("alternating series: acf(k) = (-1)^k (n-k)/n for the zero-mean case") {
    import spark.implicits._
    val n = 10
    val rows = (1 to n).map(t => (t.toLong, if (t % 2 == 0) 1.0 else -1.0))
    val out = Autocorr.acf(rows.toDF("t", "y"), "t", "y", maxLag = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(0L) == 1.0)
    assert(math.abs(out(1L) - (-(n - 1.0) / n)) < 1e-9)
    assert(math.abs(out(2L) - (n - 2.0) / n) < 1e-9)
    assert(math.abs(out(3L) - (-(n - 3.0) / n)) < 1e-9)
  }

  test("matches a brute-force correlogram on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val ys = Seq.fill(60)(rnd.nextInt(50).toDouble)
    val rows = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }
    val out = Autocorr.acf(rows.toDF("t", "y"), "t", "y", maxLag = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val mean = ys.sum / ys.size
    val den = ys.map(y => (y - mean) * (y - mean)).sum
    for (k <- 0 to 5) {
      val num = (0 until ys.size - k)
        .map(t => (ys(t) - mean) * (ys(t + k) - mean)).sum
      assert(math.abs(out(k.toLong) - num / den) < 1e-6, s"lag $k")
    }
  }

  test("constant series fails loudly instead of ANSI dividing by zero") {
    import spark.implicits._
    val rows = (1 to 20).map(t => (t.toLong, 4.0))
    val e = intercept[IllegalArgumentException] {
      Autocorr.acf(rows.toDF("t", "y"), "t", "y", maxLag = 2)
    }
    assert(e.getMessage.contains("constant"))
  }
}
