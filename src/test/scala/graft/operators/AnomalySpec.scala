package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class AnomalySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def run(vals: Seq[Long], window: Int = 10, k: Int = 3,
                  minPeriods: Int = 5): Seq[(Long, Boolean)] =
    Anomaly.rollingZ(
      vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }.toDF("key", "ts", "v"),
      Seq("key"), Seq("ts"), "v", window, k, minPeriods)
      .orderBy("ts").select("v", "is_anomaly").as[(Long, Boolean)].collect().toSeq

  test("flat history then a spike: only the spike flags") {
    val got = run(Seq.fill(10)(100L) :+ 101L)
    assert(got.take(10).forall(!_._2))
    assert(got.last._2) // zero variance: ANY deviation exceeds k·sigma
  }

  test("value equal to a zero-variance baseline does not flag") {
    val got = run(Seq.fill(10)(100L) :+ 100L)
    assert(got.forall(!_._2))
  }

  test("warm-up: fewer than minPeriods of history never flags") {
    val got = run(Seq(1L, 1000L, 1L, 1000L), minPeriods = 5)
    assert(got.forall(!_._2))
  }

  test("flag matches the floating-point z-score off boundary") {
    // noisy-ish history, then candidates around the 3-sigma line
    val hist = Seq(10L, 12L, 9L, 11L, 10L, 13L, 8L, 11L, 10L, 12L)
    for (cand <- Seq(5L, 11L, 14L, 25L, 60L)) {
      val got = run(hist :+ cand, window = 10, k = 3, minPeriods = 5).last._2
      val n = hist.size.toDouble
      val mean = hist.sum / n
      val variance = hist.map(x => (x - mean) * (x - mean)).sum / n
      val want = math.abs(cand - mean) > 3 * math.sqrt(variance)
      assert(got == want, s"cand=$cand got=$got want=$want")
    }
  }

  test("trailing window excludes the current row from its own baseline") {
    // a huge value must not mask itself by inflating the window variance
    val got = run(Seq.fill(8)(100L) ++ Seq(100000L))
    assert(got.last._2)
  }

  test("partitions are independent") {
    val df = (Seq.fill(8)((1L, 100L)) ++ Seq((1L, 500L)) ++
      Seq.fill(8)((2L, 100L)) ++ Seq((2L, 100L)))
      .zipWithIndex.map { case ((key, v), i) => (key, i.toLong, v) }
      .toDF("key", "ts", "v")
    val got = Anomaly.rollingZ(df, Seq("key"), Seq("ts"), "v", 10, 3, 5)
      .filter(col("is_anomaly")).select("key").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
