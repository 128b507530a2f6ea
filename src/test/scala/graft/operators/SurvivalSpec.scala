package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class SurvivalSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("hand-computed textbook curve with a censoring tie") {
    // durations: (1,ev) (2,ev) (2,cens) (3,ev) (4,cens) — N=5
    // t=1: risk 5, S=4/5; t=2: risk 4, S=4/5·3/4; t=3: risk 2, S=·1/2
    val df = Seq((1L, true), (2L, true), (2L, false), (3L, true), (4L, false))
      .toDF("dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((5L, 1L, 0L, 1.0 * (4.0 / 5))))
    assert(out(2L) == ((4L, 1L, 1L, 1.0 * (4.0 / 5) * (3.0 / 4))))
    assert(out(3L) == ((2L, 1L, 0L, 1.0 * (4.0 / 5) * (3.0 / 4) * (1.0 / 2))))
  }

  test("no censoring degenerates to the empirical survival function") {
    val df = Seq(1L, 1L, 2L, 3L).map((_, true)).toDF("dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(math.abs(out(1L) - 0.5) < 1e-12)   // 2 of 4 survive past 1
    assert(math.abs(out(2L) - 0.25) < 1e-12)
    assert(math.abs(out(3L) - 0.0) < 1e-12)
  }

  test("all-censored input yields no event rows (nothing to estimate, not zeros)") {
    val df = Seq((5L, false), (7L, false)).toDF("dur", "ev")
    assert(Survival.kaplanMeier(df, "dur", "ev").count() == 0)
  }

  test("NULL and negative durations are excluded") {
    val df = Seq(Some(2L), None, Some(-1L)).map(d => (d, Some(true)))
      .toDF("dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev").collect()
    assert(out.length == 1 && out(0).getLong(1) == 1L)
  }

  test("invariant to partitioning (duration-ordered factor fold)") {
    val rows = (1 to 300).map(i => ((i * 7 % 23).toLong, i % 3 != 0))
    val df = rows.toDF("dur", "ev")
    def run(d: org.apache.spark.sql.DataFrame) =
      Survival.kaplanMeier(d, "dur", "ev").orderBy("t").collect().map(_.toSeq).toSeq
    assert(run(df) == run(df.repartition(13)))
  }
}
