package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class SeparabilitySpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("hand-computed two well-separated 1-ish clusters in 2D") {
    // class a at (0, 0)/(0.25, 0), class b at (1, 0)/(0.75, 0); grid 4 (bits 2)
    // quantized: a -> (0,0), (1,0); b -> (4,0), (3,0)
    // S_a = (1,0), Q_a = 1, S_b = (7,0), Q_b = 25; S = (8,0), N = 4
    // within_a = 2*1 - 1 = 1; between_a = (1*4 - 8*2)^2 = 144
    // fisher_a = 144*4 / (1 * 8^2) = 9
    val df = Seq((("a"), vec(0, 0)), ("a", vec(0.25, 0)),
      ("b", vec(1, 0)), ("b", vec(0.75, 0)))
      .toDF("label", "v")
      .selectExpr("label", "CAST(v AS ARRAY<FLOAT>) AS v")
    val out = Separability.fisherPerClass(df, "label", "v", gridBits = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(3).longValueExact, r.getDecimal(4).longValueExact,
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5)))).toMap
    val (na, wa, ba, fa) = out("a")
    assert(na == 2L && wa == 1L && ba == 144L)
    assert(fa == 9.0)
    val (_, wb, bb, fb) = out("b")
    assert(wb == 2L * 25L - 49L && bb == 144L)
    assert(fb == 144.0 * 4 / (1.0 * 64))
  }

  test("identical classes have zero between-scatter") {
    val df = Seq(("a", vec(0.5, 0.5)), ("a", vec(0.7, 0.1)),
      ("b", vec(0.5, 0.5)), ("b", vec(0.7, 0.1)))
      .toDF("label", "v").selectExpr("label", "CAST(v AS ARRAY<FLOAT>) AS v")
    val out = Separability.fisherPerClass(df, "label", "v", gridBits = 10)
      .collect()
    out.foreach(r => assert(r.getDecimal(4).longValueExact == 0L))
  }

  test("a zero-spread class yields NULL fisher, not infinity") {
    val df = Seq(("a", vec(0.5, 0.5)), ("a", vec(0.5, 0.5)), ("b", vec(0.1, 0.9)))
      .toDF("label", "v").selectExpr("label", "CAST(v AS ARRAY<FLOAT>) AS v")
    val out = Separability.fisherPerClass(df, "label", "v", gridBits = 10)
      .collect().map(r => r.getString(0) -> r.isNullAt(5)).toMap
    assert(out("a") && out("b")) // both single-point-ish: no within-scatter
  }

  test("invariant to input partitioning (exact decimal scatter sums)") {
    val rows = (1 to 400).map(i =>
      (s"c${i % 5}", vec((i % 17) / 17.0, (i % 11) / 11.0, (i % 7) / 7.0)))
    val df = rows.toDF("label", "v").selectExpr("label", "CAST(v AS ARRAY<FLOAT>) AS v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Separability.fisherPerClass(d, "label", "v")
        .orderBy("label").collect().map(_.toSeq).toSeq
    assert(run(df) == run(df.repartition(13)))
  }
}
