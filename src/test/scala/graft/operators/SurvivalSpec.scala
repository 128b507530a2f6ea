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

  test("logRank hand-computed: fully separated groups") {
    import spark.implicits._
    // g1 both die at t=1, g0 both at t=2:
    // t=1: e1 = 2*2/4 = 1, v = 2*.25*2/3 = 1/3; t=2: e1 = 0, v = 0
    // chi2 = (2-1)^2 / (1/3) = 3
    val rows = Seq((1L, true, 1), (1L, true, 1), (2L, true, 0),
      (2L, true, 0)).toDF("dur", "ev", "grp")
    val out = Survival.logRank(rows, "dur", "ev", "grp").collect()
    assert(out.length == 2)
    assert(math.abs(out(0).getAs[Double]("chi2") - 3.0) < 1e-6)
    assert(out(0).getAs[Double]("e1") == 1.0)
    assert(out(0).getAs[Long]("n_risk1") == 2 &&
      out(0).getAs[Long]("n_risk0") == 2)
  }

  test("logRank: identical groups give chi2 near zero; censoring shifts risk sets") {
    import spark.implicits._
    val rows = (1L to 20L).flatMap(i =>
      Seq((i % 5 + 1, true, 1), (i % 5 + 1, true, 0)))
      .toDF("dur", "ev", "grp")
    val chi = Survival.logRank(rows, "dur", "ev", "grp")
      .head().getAs[Double]("chi2")
    assert(chi < 1e-9, s"identical groups chi2=$chi")
    // a censored g1 row at t=1 is still at risk AT t=1 but gone at t=2
    val cen = Seq((1L, false, 1), (2L, true, 1), (2L, true, 0),
      (3L, false, 0)).toDF("dur", "ev", "grp")
    val r2 = Survival.logRank(cen, "dur", "ev", "grp").head()
    assert(r2.getAs[Long]("n_risk1") == 1, "censored row left before t=2")
  }

  test("logRank fails loudly on non-binary groups") {
    import spark.implicits._
    val rows = Seq((1L, true, 2)).toDF("dur", "ev", "grp")
    assert(intercept[IllegalArgumentException] {
      Survival.logRank(rows, "dur", "ev", "grp")
    }.getMessage.contains("0/1"))
  }

  test("rmst hand-computed: step integral plus the S=1 head stretch") {
    import spark.implicits._
    // one event at t=2 (n=2, surv drops to .5), one censored at 5
    val rows = Seq((2L, true), (5L, false)).toDF("dur", "ev")
    val r = Survival.rmst(rows, "dur", "ev", tau = 10L).head()
    // rmst = 2*1.0 + (10-2)*0.5 = 6; median at t=2
    assert(r.getLong(0) == 10L)
    assert(math.abs(r.getDouble(1) - 6.0) < 1e-9)
    assert(r.getLong(2) == 2L)
  }

  test("rmst: horizon truncates intervals; no-median stays NULL") {
    import spark.implicits._
    // event at t=8 among 4 units: surv drops only to .75 — no median
    val rows = Seq((8L, true), (9L, false), (9L, false), (9L, false))
      .toDF("dur", "ev")
    val r = Survival.rmst(rows, "dur", "ev", tau = 5L).head()
    // tau=5 < first event time: rmst = min(8,5) = 5 (all head stretch)
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-9)
    assert(r.isNullAt(2), "median undefined above the curve floor")
  }

  test("nelson-aalen hand-computed with censoring, partition-invariant") {
    import spark.implicits._
    // durs: events at t=1 (2 of 5 at risk), censor at t=2,
    // event at t=3 (1 of 2 at risk)
    val durs = Seq((1L, true), (1L, true), (2L, false), (3L, true),
      (3L, false)).toDF("dur", "event")
    val out = Survival.nelsonAalen(durs.repartition(3), "dur", "event")
      .collect()
    assert(out.length == 2)
    val r1 = out(0); val r3 = out(1)
    assert(r1.getAs[Long]("t") == 1L && r1.getAs[Long]("n_risk") == 5L)
    assert(math.abs(r1.getAs[Double]("na_cumhaz") - 0.4) < 1e-9)
    assert(math.abs(r1.getAs[Double]("na_se") - math.sqrt(2.0 / 25)) < 1e-6)
    assert(r3.getAs[Long]("t") == 3L && r3.getAs[Long]("n_risk") == 2L)
    assert(math.abs(r3.getAs[Double]("na_cumhaz") - (0.4 + 0.5)) < 1e-9)
    assert(math.abs(r3.getAs[Double]("na_se") -
      math.sqrt(2.0 / 25 + 1.0 / 4)) < 1e-6)
  }

  test("nelson-aalen approximates -ln(km survival) on event-only data") {
    import spark.implicits._
    val durs = (1L to 40L).map(i => (i % 7 + 1, true)).toDF("dur", "event")
    val na = Survival.nelsonAalen(durs, "dur", "event")
      .collect().map(r => (r.getAs[Long]("t"), r.getAs[Double]("na_cumhaz")))
    val km = Survival.kaplanMeier(durs, "dur", "event")
      .collect().map(r => (r.getAs[Long]("t"), -math.log(r.getAs[Double]("surv"))))
      .toMap
    na.dropRight(1).foreach { case (t, h) => // last step: S = 0, ln blows
      assert(math.abs(h - km(t)) < 0.6, s"t=$t h=$h lnS=${km(t)}")
      assert(h <= km(t) + 1e-9, "H(t) lower-bounds -ln S(t)")
    }
  }
  test("aalenJohansen hand-computed: CIFs allocate hazard by cause and sum with S to 1") {
    // (1,c1) (2,c2) (2,c1) (3,cens) (4,c1) (5,cens) — N=6
    // t=1: n=6, S(1-)=1,    cif1 += 1/6
    // t=2: n=5, S(2-)=5/6,  cif1 += 1/6, cif2 += 1/6
    // t=4: n=2, S(4-)=1/2,  cif1 += 1/4
    val df = Seq((1L, 1), (2L, 2), (2L, 1), (3L, 0), (4L, 1), (5L, 0))
      .toDF("dur", "cause")
    val out = Survival.aalenJohansen(df, "dur", "cause").collect()
    assert(out.map(_.getAs[Long]("t")).toSeq == Seq(1L, 2L, 4L))
    assert(out.map(_.getAs[Long]("n_risk")).toSeq == Seq(6L, 5L, 2L))
    assert(out.map(_.getAs[Double]("cif1")).toSeq ==
      Seq(0.166667, 0.333333, 0.583333))
    assert(out.map(_.getAs[Double]("cif2")).toSeq ==
      Seq(0.0, 0.166667, 0.166667))
    assert(out.map(_.getAs[Double]("km_all")).toSeq ==
      Seq(0.833333, 0.5, 0.25))
    // the identity the naive per-cause KM breaks: CIF1+CIF2+S = 1
    out.foreach { r =>
      val s = r.getAs[Double]("cif1") + r.getAs[Double]("cif2") +
        r.getAs[Double]("km_all")
      assert(math.abs(s - 1.0) < 1e-5, r.toString)
    }
  }

  test("aalenJohansen with one cause only reduces to 1 - KM") {
    val df = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 1), (4L, 0))
      .toDF("dur", "cause")
    val aj = Survival.aalenJohansen(df, "dur", "cause").collect()
    val km = Survival.kaplanMeier(
      df.selectExpr("dur", "cause = 1 AS ev"), "dur", "ev").collect()
    val kmS = km.map(r => r.getAs[Long]("t") ->
      math.rint(r.getAs[Double]("surv") * 1e6) / 1e6).toMap
    aj.foreach { r =>
      val t = r.getAs[Long]("t")
      assert(math.abs(r.getAs[Double]("cif1") - (1.0 - kmS(t))) < 2e-6,
        s"t=$t")
      assert(r.getAs[Double]("cif2") == 0.0)
    }
  }

  test("aalenJohansen refuses causes outside {0,1,2} and is partition-invariant") {
    assert(intercept[IllegalArgumentException] {
      Survival.aalenJohansen(Seq((1L, 3)).toDF("dur", "cause"),
        "dur", "cause")
    }.getMessage.contains("cause"))
    val df = Seq((1L, 1), (2L, 2), (2L, 1), (3L, 0), (4L, 1), (5L, 0),
      (6L, 2), (7L, 1)).toDF("dur", "cause")
    val a = Survival.aalenJohansen(df, "dur", "cause").collect()
    val b = Survival.aalenJohansen(df.repartition(5), "dur", "cause").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
