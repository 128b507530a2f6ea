package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the experiment estimators: CUPED against the
  * textbook per-row computation, the variance-reduction identity
  * (= corr²), the NULL contract; DiD against the four-cell hand
  * computation and its missing-cell guard; the Simpson audit against a
  * constructed reversal. */
class ExperimentsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val units = Seq(
    // (x pre, y post, arm)
    (10.0, 12.0, 0), (20.0, 25.0, 0), (30.0, 31.0, 0),
    (12.0, 20.0, 1), (22.0, 33.0, 1), (28.0, 40.0, 1))

  test("cupedLift matches the textbook per-row adjustment") {
    val out = Experiments.cupedLift(units.toDF("x", "y", "arm"), "x", "y", "arm")
      .collect().map(r => r.getInt(0) -> r).toMap
    val x = units.map(_._1); val y = units.map(_._2)
    val n = x.length
    val xb = x.sum / n; val yb = y.sum / n
    val theta = x.zip(y).map { case (a, b) => (a - xb) * (b - yb) }.sum /
      x.map(a => (a - xb) * (a - xb)).sum
    def adjMean(arm: Int): Double = {
      val sel = units.filter(_._3 == arm)
      sel.map { case (a, b, _) => b - theta * (a - xb) }.sum / sel.length
    }
    assert(math.abs(out(0).getAs[Double]("theta") - theta) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("adj_mean_y") - adjMean(0)) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("adj_mean_y") - adjMean(1)) < 1e-12)
    // var_reduction == corr²(x, y) (the θ = cov/var identity)
    val corr2 = {
      val cov = x.zip(y).map { case (a, b) => (a - xb) * (b - yb) }.sum
      cov * cov / (x.map(a => (a - xb) * (a - xb)).sum *
        y.map(b => (b - yb) * (b - yb)).sum)
    }
    assert(math.abs(out(0).getAs[Double]("var_reduction") - corr2) < 1e-12)
  }

  test("cupedLift rejects NULL units loudly (NULL is a bug, zero a statement)") {
    val df = Seq((Some(1.0), Some(2.0), Some(0)), (None, Some(3.0), Some(1)))
      .toDF("x", "y", "arm")
    val ex = intercept[IllegalArgumentException] {
      Experiments.cupedLift(df, "x", "y", "arm")
    }
    assert(ex.getMessage.contains("coalesce"))
  }

  test("diffInDiff matches the four-cell hand computation and guards shape") {
    val rows = Seq(
      (false, false, 10.0), (false, false, 14.0), // ctrl pre  mean 12
      (false, true, 13.0), (false, true, 15.0),   // ctrl post mean 14
      (true, false, 20.0), (true, false, 24.0),   // treat pre mean 22
      (true, true, 30.0), (true, true, 40.0))     // treat post mean 35
    val r = Experiments.diffInDiff(rows.toDF("t", "p", "v"), "v", "t", "p").head()
    assert(r.getAs[Double]("did") == (35.0 - 22.0) - (14.0 - 12.0))
    assert(r.getAs[Long]("n_treat_post") == 2L)
    val ex = intercept[IllegalArgumentException] {
      Experiments.diffInDiff(rows.filter(_._1).toDF("t", "p", "v"), "v", "t", "p")
    }
    assert(ex.getMessage.contains("4"))
  }

  test("stratifiedAte: mix-weighted per-stratum diffs, confounding corrected") {
    // covariate x in {0, 1000000} (2 strata of a 2-strata request);
    // within each stratum treatment adds exactly +5; arms are
    // imbalanced ACROSS strata so the naive pooled diff is confounded
    val rows =
      Seq.fill(8)((0L, false, 10.0)) ++ Seq.fill(2)((0L, true, 15.0)) ++
      Seq.fill(2)((1000000L, false, 100.0)) ++ Seq.fill(8)((1000000L, true, 105.0))
    val out = Experiments.stratifiedAte(rows.toDF("x", "arm", "y"),
      "x", "arm", "y", strata = 2).collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getAs[Double]("diff") == 5.0))
    assert(out.head.getAs[Double]("ate") == 5.0) // mix weights sum out
    // the naive pooled diff is NOT 5 (confounded by the x-arm mix)
    val naive = (2 * 15.0 + 8 * 105.0) / 10 - (8 * 10.0 + 2 * 100.0) / 10
    assert(math.abs(naive - 5.0) > 10)
  }

  test("stratifiedAte rejects one-armed strata loudly") {
    val rows = Seq.fill(5)((0L, false, 1.0)) ++ Seq.fill(5)((1000000L, true, 2.0))
    val ex = intercept[IllegalArgumentException] {
      Experiments.stratifiedAte(rows.toDF("x", "arm", "y"), "x", "arm", "y",
        strata = 2)
    }
    assert(ex.getMessage.contains("one arm"))
  }

  test("srmAudit: the chi2 collapse is exact and the p=0.001 bar flags " +
       "a real mismatch, not noise") {
    // balanced-ish: 510 vs 490 -> chi2 = 400/1000 = 0.4, no flag
    val ok = Seq.fill(510)(("e1", false)) ++ Seq.fill(490)(("e1", true))
    // broken assignment: 600 vs 400 -> chi2 = 40000/1000 = 40, flag
    val bad = Seq.fill(600)(("e2", false)) ++ Seq.fill(400)(("e2", true))
    val out = Experiments.srmAudit((ok ++ bad).toDF("e", "a"), "e", "a")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("e1").getAs[Double]("chi2") == 0.4)
    assert(!out("e1").getAs[Boolean]("srm"))
    assert(out("e2").getAs[Double]("chi2") == 40.0)
    assert(out("e2").getAs[Boolean]("srm"))
  }

  test("twoProportionZ matches the textbook pooled z; one-armed is loud") {
    val rows = Seq.fill(204)((false, true)) ++ Seq.fill(358)((false, false)) ++
      Seq.fill(185)((true, true)) ++ Seq.fill(253)((true, false))
    val r = Experiments.twoProportionZ(rows.toDF("a", "s"), "a", "s").head()
    val (n0, n1, x0, x1) = (562.0, 438.0, 204.0, 185.0)
    val p = (x0 + x1) / (n0 + n1)
    val z = (x1 / n1 - x0 / n0) / math.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
    assert(r.getAs[Double]("z") == z)
    intercept[IllegalArgumentException] {
      Experiments.twoProportionZ(rows.filter(_._1).toDF("a", "s"), "a", "s")
    }
  }

  test("simpsonAudit flags a constructed reversal") {
    // the kidney-stone table: arm 0 better IN EACH stratum (93>87,
    // 73>69), arm 1 better pooled (83>78) — mix shift
    val rows =
      Seq.fill(81)(("easy", false, true)) ++ Seq.fill(6)(("easy", false, false)) ++   // 81/87
      Seq.fill(234)(("easy", true, true)) ++ Seq.fill(36)(("easy", true, false)) ++   // 234/270
      Seq.fill(192)(("hard", false, true)) ++ Seq.fill(71)(("hard", false, false)) ++ // 192/263
      Seq.fill(55)(("hard", true, true)) ++ Seq.fill(25)(("hard", true, false))       // 55/80
    val out = Experiments.simpsonAudit(rows.toDF("s", "a", "ok"), "s", "a", "ok")
      .collect()
    assert(out.forall(_.getAs[Boolean]("reversed")), out.mkString(", "))
    assert(out.head.getAs[Double]("pooled_diff") > 0)
    out.foreach(r => assert(r.getAs[Double]("diff") < 0))
  }

  test("cmh hand-computed: two strata, known chi2 and MH odds ratio") {
    import spark.implicits._
    // stratum s1: a=4 b=1 c=2 d=3; s2: a=2 b=3 c=1 d=4 (n=10 each)
    // E1=3, dev1=1, V1=5*5*6*4/900=2/3; E2=1.5, dev2=.5, V2=5*5*3*7/900
    // CMH=(1.5)^2/(600/900+525/900)=2.25/1.25=1.8
    // OR_MH=(4*3/10+2*4/10)/(1*2/10+3*1/10)=2.0/0.5=4.0
    def unit(s: String, arm: Int, y: Boolean, k: Int) =
      Seq.fill(k)((s, arm, y))
    val rows =
      unit("s1", 1, true, 4) ++ unit("s1", 1, false, 1) ++
      unit("s1", 0, true, 2) ++ unit("s1", 0, false, 3) ++
      unit("s2", 1, true, 2) ++ unit("s2", 1, false, 3) ++
      unit("s2", 0, true, 1) ++ unit("s2", 0, false, 4)
    val out = Experiments.cmh(rows.toDF("s", "arm", "y"), "s", "arm", "y")
      .collect()
    assert(out.length == 2)
    val r1 = out.head
    assert((r1.getLong(2), r1.getLong(3), r1.getLong(4), r1.getLong(5)) ==
      ((4L, 1L, 2L, 3L)))
    assert(math.abs(r1.getAs[Double]("or_stratum") - 6.0) < 1e-9)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("cmh_chi2") - 1.8) < 1e-6)
      assert(math.abs(r.getAs[Double]("or_mh") - 4.0) < 1e-6)
    }
  }

  test("cmh fails loudly when a margin is empty in every stratum") {
    import spark.implicits._
    val rows = Seq(("s1", 1, true), ("s1", 1, true), ("s2", 1, false),
      ("s2", 1, true))
    val e = intercept[IllegalArgumentException] {
      Experiments.cmh(rows.toDF("s", "arm", "y"), "s", "arm", "y")
    }
    assert(e.getMessage.contains("variance"))
  }

  test("mcnemar hand-computed with continuity correction") {
    import spark.implicits._
    val rows = Seq.fill(10)((true, true)) ++ Seq.fill(6)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))
    val r = Experiments.mcnemar(rows.toDF("a", "b"), "a", "b").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((10L, 6L, 2L, 3L)))
    // (|6-2|-1)^2 / 8 = 9/8
    assert(math.abs(r.getAs[Double]("chi2_cc") - 1.125) < 1e-9)
  }

  test("mcnemar fails loudly with no discordant pairs") {
    import spark.implicits._
    val rows = Seq((true, true), (false, false))
    assert(intercept[IllegalArgumentException] {
      Experiments.mcnemar(rows.toDF("a", "b"), "a", "b")
    }.getMessage.contains("discordant"))
  }

  test("mdePower hand-computed at the pinned alpha/power constants") {
    import spark.implicits._
    val rows = Seq.tabulate(200) { i =>
      ("e1", i % 2, i < 40) // 100/arm, 40 successes -> pooled .2
    }
    val r = Experiments.mdePower(rows.toDF("e", "arm", "y"),
      "e", "arm", "y").head()
    assert(r.getLong(1) == 100 && r.getLong(2) == 100)
    val mde = (1.959963984540054 + 0.8416212335729143) *
      math.sqrt(0.2 * 0.8 * (1.0 / 100 + 1.0 / 100))
    assert(math.abs(r.getAs[Double]("mde_abs") - mde) < 1e-6)
    assert(math.abs(r.getAs[Double]("mde_rel") - mde / 0.2) < 1e-6)
  }

  test("mdePower excludes degenerate experiments (one arm / all-or-none)") {
    import spark.implicits._
    val rows = Seq(("one_arm", 1, true), ("one_arm", 1, false),
      ("all_win", 0, true), ("all_win", 1, true))
    val out = Experiments.mdePower(rows.toDF("e", "arm", "y"),
      "e", "arm", "y").collect()
    assert(out.isEmpty)
  }

  test("effectSize hand-computed d and the Hedges small-sample correction") {
    import spark.implicits._
    // arm0 = {1,3} (mean 2, var 2), arm1 = {4,6} (mean 5, var 2)
    // sp2 = (2 + 2)/2 = 2, d = 3/sqrt(2); g = d*(1 - 3/(4*4-9))
    val rows = Seq(("e", 0, 1.0), ("e", 0, 3.0), ("e", 1, 4.0),
      ("e", 1, 6.0))
    val r = Experiments.effectSize(rows.toDF("e", "arm", "y"),
      "e", "arm", "y").head()
    val d = 3.0 / math.sqrt(2.0)
    assert(math.abs(r.getAs[Double]("cohens_d") - d) < 1e-6)
    assert(math.abs(r.getAs[Double]("hedges_g") - d * (1 - 3.0 / 7.0))
      < 1e-6)
    assert(math.abs(r.getAs[Double]("pooled_sd") - math.sqrt(2.0)) < 1e-6)
  }

  test("effectSize excludes degenerate experiments (tiny arm, zero spread)") {
    import spark.implicits._
    val rows = Seq(("tiny", 0, 1.0), ("tiny", 1, 2.0), ("tiny", 1, 3.0),
      ("flat", 0, 5.0), ("flat", 0, 5.0), ("flat", 1, 5.0),
      ("flat", 1, 5.0))
    val out = Experiments.effectSize(rows.toDF("e", "arm", "y"),
      "e", "arm", "y").collect()
    assert(out.isEmpty)
  }

  test("cochranQ matches the textbook statistic and drops incomplete cases") {
    import spark.implicits._
    // 6 docs x 3 classifiers; one row with a NULL outcome must drop
    val rows = Seq(
      (Some(true), Some(true), Some(false)),
      (Some(true), Some(false), Some(false)),
      (Some(true), Some(true), Some(true)),
      (Some(false), Some(true), Some(false)),
      (Some(true), Some(false), Some(true)),
      (Some(true), None, Some(true)))
    val df = rows.toDF("a", "b", "c")
    val out = Experiments.cochranQ(df, Seq("a", "b", "c")).collect()
    assert(out.length == 3)
    val g = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g == Map("a" -> 4L, "b" -> 3L, "c" -> 2L))
    // complete cases: 5 rows; L = 2,1,3,1,2; SL=9, SLL=19
    // Q = 2*(3*(16+9+4) - 81) / (3*9 - 19) = 2*6/8 = 1.5
    val r0 = out.head
    assert(r0.getAs[Long]("n") == 5L && r0.getAs[Long]("k") == 3L)
    assert(r0.getAs[Double]("q") == 1.5 && r0.getAs[Long]("df") == 2L)
  }

  test("cochranQ refuses an all-concordant panel") {
    import spark.implicits._
    val df = Seq((true, true), (false, false), (true, true))
      .toDF("a", "b")
    intercept[IllegalArgumentException] {
      Experiments.cochranQ(df, Seq("a", "b"))
    }
  }

  test("friedman: no-tie case matches the classical formula") {
    import spark.implicits._
    // 4 identical blocks ranking a<b<c: R2 = (8,16,24), chi2 = 8
    // (classical 12n/(k(k+1))*sum((Rbar_j-(k+1)/2)^2) = 12*4/12*2 = 8)
    val df = Seq.fill(4)((1L, 2L, 3L)).toDF("a", "b", "c")
    val out = Experiments.friedman(df, Seq("a", "b", "c")).collect()
    assert(out.map(r => (r.getAs[String]("system"),
      r.getAs[Double]("rank_sum"))).toSeq ==
      Seq(("a", 4.0), ("b", 8.0), ("c", 12.0)))
    assert(out.forall(_.getAs[Double]("chi2_f") == 8.0))
    assert(out.forall(_.getAs[Long]("df") == 2L))
  }

  test("friedman: hand-computed tie-corrected case") {
    import spark.implicits._
    // blocks: (1,2,3),(2,4,6),(3,1,2),(1,1,2) — the last has a tied
    // bottom pair (midrank 1.5): R2 = (13,13,22), S4 = 222,
    // chi2 = 2*((13-16)^2+(13-16)^2+(22-16)^2)/(222-192) = 108/30 = 3.6
    val df = Seq((1L, 2L, 3L), (2L, 4L, 6L), (3L, 1L, 2L), (1L, 1L, 2L))
      .toDF("a", "b", "c")
    val out = Experiments.friedman(df, Seq("a", "b", "c")).collect()
    assert(out.map(_.getAs[Double]("rank_sum")).toSeq ==
      Seq(6.5, 6.5, 11.0))
    assert(out.forall(_.getAs[Double]("chi2_f") == 3.6))
  }

  test("friedman refuses all-tied blocks and non-integer scores") {
    import spark.implicits._
    val tied = Seq((1L, 1L), (7L, 7L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      Experiments.friedman(tied, Seq("a", "b")))
    assert(e.getMessage.contains("zero rank variance"))
    val dbl = Seq((1.0, 2.0)).toDF("a", "b")
    intercept[IllegalArgumentException](
      Experiments.friedman(dbl, Seq("a", "b")))
  }

  test("pageTrend: perfect ascending order hits the exact maximum L") {
    import spark.implicits._
    // every block ranks a<b<c in hypothesis order: L = n*(1+4+9) = 14n,
    // E[L] = 12n, Var[L] = 2n -> z = 2n/sqrt(2n) = sqrt(2n)
    val n = 8
    val df = Seq.fill(n)((1L, 5L, 9L)).toDF("a", "b", "c")
    val out = Experiments.pageTrend(df, Seq("a", "b", "c")).collect()
    assert(out.forall(_.getAs[Double]("l") == 14.0 * n))
    assert(out.head.getAs[Double]("z") ==
      BigDecimal(math.sqrt(2.0 * n)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.map(r => (r.getAs[Long]("position"),
      r.getAs[String]("system"))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("pageTrend: reversed order gives the mirrored negative z; " +
    "order-agnostic friedman sees the same chi2 either way") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong * 3, i.toLong * 2, i.toLong))
      .toDF("hi", "mid", "lo")
    val asc = Experiments.pageTrend(df, Seq("lo", "mid", "hi")).head()
    val desc = Experiments.pageTrend(df, Seq("hi", "mid", "lo")).head()
    assert(asc.getAs[Double]("z") > 0 &&
      asc.getAs[Double]("z") == -desc.getAs[Double]("z"))
    val f1 = Experiments.friedman(df, Seq("lo", "mid", "hi")).head()
      .getAs[Double]("chi2_f")
    val f2 = Experiments.friedman(df, Seq("hi", "mid", "lo")).head()
      .getAs[Double]("chi2_f")
    assert(f1 == f2)
  }

  test("groupSequential: OBF boundaries decay as c*sqrt(K/k); a planted " +
    "late effect crosses only the cheap late looks") {
    import spark.implicits._
    // looks 1-2: identical 10% rates both arms; looks 3-5: arm 1 jumps
    // to 60% — early looks must NOT cross (huge early boundary), the
    // accumulated late looks must
    val rows = (1 to 5).flatMap { lk =>
      val p1 = if (lk >= 3) 60 else 10
      (1 to 200).map(i => (0, i % 10 == 0, lk)) ++
        (1 to 200).map(i => (1, i % 100 < p1, lk))
    }
    val out = Experiments.groupSequential(rows.toDF("arm", "conv", "look"),
      "arm", "conv", "look", looks = 5).collect()
    val byLook = out.map(r => r.getAs[Long]("look") ->
      (r.getAs[Double]("boundary"), r.getAs[Boolean]("crossed"))).toMap
    assert(byLook(1L)._1 ==
      BigDecimal(2.0401 * math.sqrt(5.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(byLook(5L)._1 ==
      BigDecimal(2.0401).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!byLook(1L)._2 && !byLook(2L)._2) // null regime, huge bound
    assert(byLook(4L)._2 && byLook(5L)._2)   // accumulated effect
    // cumulative counts: look 5 carries all 2000 rows
    assert(out.map(r => r.getAs[Long]("n0") + r.getAs[Long]("n1")).max ==
      2000L)
  }

  test("groupSequential refuses a look with an empty arm") {
    import spark.implicits._
    val rows = (1 to 50).map(i => (0, i % 5 == 0, 1)) ++
      (1 to 50).map(i => (1, i % 5 == 0, 2)) // look 1 has no arm-1 data
    val e = intercept[IllegalArgumentException](
      Experiments.groupSequential(rows.toDF("arm", "conv", "look"),
        "arm", "conv", "look", looks = 2))
    assert(e.getMessage.contains("degenerate cumulative state"))
  }

  test("yuen: hand-computed trimmed means, winsorized variance, Welch df") {
    import spark.implicits._
    // arm0 = 1..10, arm1 = 11..20 (same spread): k = 2, h = 6,
    // tmeans 5.5 / 15.5; s2w = 425/90, d = 9*s2w/30 each, df = 10
    val df = ((1 to 10).map(v => (0, v.toLong)) ++
      (11 to 20).map(v => (1, v.toLong))).toDF("g", "v")
    val r = Experiments.yuen(df, "g", "v").head()
    assert(r.getAs[Long]("n0") == 10L && r.getAs[Long]("h0") == 6L)
    assert(r.getAs[Double]("tmean0") == 5.5)
    assert(r.getAs[Double]("tmean1") == 15.5)
    assert(r.getAs[Double]("diff") == 10.0)
    assert(r.getAs[Double]("df_welch") == 10.0)
    val d = 9.0 * (425.0 / 90.0) / 30.0
    val expT = 10.0 / math.sqrt(2.0 * d)
    assert(math.abs(r.getAs[Double]("t") - expT) < 1e-6)
  }

  test("yuen: a wild outlier inside the trim band changes NOTHING") {
    import spark.implicits._
    val base = ((1 to 10).map(v => (0, v.toLong)) ++
      (11 to 20).map(v => (1, v.toLong))).toDF("g", "v")
    val poisoned = ((1 to 10).map(v => (0, v.toLong)) ++
      (11 to 19).map(v => (1, v.toLong)) :+ ((1, 1000000000L)))
      .toDF("g", "v")
    // the outlier replaces 20: order stats v_(3)=13, v_(8)=18 unchanged,
    // so trimmed mean AND winsorized variance are identical
    assert(Experiments.yuen(base, "g", "v").head().toSeq ==
      Experiments.yuen(poisoned, "g", "v").head().toSeq)
  }

  test("yuen: partitioning-invariant; refuses tiny arms and doubles") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = Seq.fill(400)((rnd.nextInt(2), rnd.nextInt(500).toLong))
      .toDF("g", "v")
    val a = Experiments.yuen(df.coalesce(1), "g", "v").head().toSeq
    val b = Experiments.yuen(df.repartition(13), "g", "v").head().toSeq
    assert(a == b)
    val tiny = Seq((0, 1L), (0, 2L), (1, 5L), (1, 6L)).toDF("g", "v")
    val e = intercept[IllegalArgumentException](
      Experiments.yuen(tiny, "g", "v"))
    assert(e.getMessage.contains("too small"))
    val dbl = Seq((0, 1.0), (1, 2.0)).toDF("g", "v")
    intercept[IllegalArgumentException](Experiments.yuen(dbl, "g", "v"))
  }

  test("friedman drops incomplete blocks; partitioning-invariant") {
    import spark.implicits._
    val df = (Seq((Some(1L), Some(2L)), (Some(2L), Some(1L)),
      (None, Some(5L)), (Some(3L), None)) ++
      Seq.fill(10)((Some(1L), Some(4L)))).toDF("a", "b")
    val r = Experiments.friedman(df, Seq("a", "b")).head()
    assert(r.getAs[Long]("n") == 12L) // the two NULL blocks dropped
    val a = Experiments.friedman(df.coalesce(1), Seq("a", "b"))
      .collect().map(_.toString).toSeq
    val b = Experiments.friedman(df.repartition(7), Seq("a", "b"))
      .collect().map(_.toString).toSeq
    assert(a == b)
  }
}
