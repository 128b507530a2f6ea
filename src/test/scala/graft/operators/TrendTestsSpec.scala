package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for the trend pair: Mann–Kendall S/ties/z against
  * hand computation (monotone, flat, tied series), the duplicate-grid
  * guard, and Theil–Sen's two-phase median against the naive sorted
  * median on both parities plus the breakdown-resistance property. */
class TrendTestsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("mannKendall: strictly increasing series has S = n(n-1)/2, z > 0") {
    val n = 20
    val df = (0 until n).map(i => (i.toLong, i * 2.0)).toDF("t", "v")
    val r = TrendTests.mannKendall(df, "t", "v").head()
    assert(r.getAs[Long]("s") == n.toLong * (n - 1) / 2)
    assert(r.getAs[Long]("tie_adj") == 0L)
    assert(r.getAs[Double]("z") > 3.0)
  }

  test("mannKendall: tie correction matches the hand formula") {
    // values: 1,1,1,2,2,3 -> tie groups {3, 2}; S counted by hand
    val vs = Seq(1.0, 1.0, 1.0, 2.0, 2.0, 3.0)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("t", "v")
    val r = TrendTests.mannKendall(df, "t", "v").head()
    val pairs = for (i <- vs.indices; j <- vs.indices if i < j)
      yield math.signum(vs(j) - vs(i)).toLong
    assert(r.getAs[Long]("s") == pairs.sum)
    val tieAdj = 3L * 2 * 11 + 2L * 1 * 9 // t(t-1)(2t+5) for 3 and 2
    assert(r.getAs[Long]("tie_adj") == tieAdj)
    val n = 6L
    assert(r.getAs[Double]("var_s") ==
      (n * (n - 1) * (2 * n + 5) - tieAdj).toDouble / 18.0)
  }

  test("mannKendall rejects duplicate grid positions loudly") {
    val df = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("t", "v")
    val ex = intercept[IllegalArgumentException] {
      TrendTests.mannKendall(df, "t", "v")
    }
    assert(ex.getMessage.contains("aggregate"))
  }

  private def naiveTheilSen(pts: Seq[(Long, Double)]): Double = {
    val slopes = (for {
      i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
    } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1).toDouble).sorted
    val p = slopes.length
    (slopes((p + 1) / 2 - 1) + slopes(p / 2)) / 2.0
  }

  test("theilSen equals the naive sorted median on both pair parities") {
    // n = 4 -> 6 pairs (even median); n = 5 -> 10 pairs (even); n = 3 -> 3 (odd)
    // values exact at 6 dp: the operator's grid quantizes v to
    // DECIMAL(38,6) by contract (exact comparisons), so the reference
    // must see the same micro-unit values
    for (n <- Seq(3, 4, 5, 9)) {
      val pts = (0 until n).map(i =>
        (i.toLong, math.rint((math.sin(i * 2.7) * 10 + i * 0.5) * 1e6) / 1e6))
      val r = TrendTests.theilSen(pts.toDF("t", "v"), "t", "v").head()
      // 1e-9: the decimal-vs-double delta path differs by ≤ 1 ulp of
      // the 6-dp values; the rank SELECTION is what's under test
      assert(math.abs(r.getAs[Double]("slope") - naiveTheilSen(pts)) < 1e-9,
        s"n=$n")
      assert(r.getAs[Long]("n_pairs") == n.toLong * (n - 1) / 2)
    }
  }

  test("theilSen shrugs off a 25% outlier corruption that owns the OLS fit") {
    val clean = (0 until 16).map(i => (i.toLong, 2.0 * i + 1))
    val corrupted = clean.take(12) ++
      clean.drop(12).map { case (t, _) => (t, 1000.0) }
    val r = TrendTests.theilSen(corrupted.toDF("t", "v"), "t", "v").head()
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 0.5,
      s"slope=${r.getAs[Double]("slope")}")
  }

  test("medianByTwoPhase refuses inputs past the grid-bounded contract") {
    val vals = Seq(0.25, 1.5, 7.75).toDF("v")
    val e = intercept[IllegalArgumentException] {
      TrendTests.medianByTwoPhase(vals, "v", 3L, maxBuckets = 2)
    }
    assert(e.getMessage.contains("grid-bounded contract"))
    // within the bound the exact median comes back
    assert(TrendTests.medianByTwoPhase(vals, "v", 3L) == 1.5)
  }

  test("theilSen on the real hourly series matches the naive median") {
    import org.apache.spark.sql.functions._
    val g = graft.Tables.t(spark, sf, "events").filter(col("ts").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)").as("v"))
      .select(floor(unix_timestamp(col("h")) / 3600).cast("long").as("t"), col("v"))
    val pts = g.collect().map(r => (r.getLong(0),
      r.getDecimal(1).doubleValue())).toSeq
    val r = TrendTests.theilSen(g, "t", "v").head()
    assert(math.abs(r.getAs[Double]("slope") - naiveTheilSen(pts)) < 1e-12)
  }

  test("runsTest: hand-computed runs with a median tie dropped") {
    import spark.implicits._
    // [1,2,9,3,8,4,7]: lower median 4 (dropped); signs F F T F T T
    // → 4 runs, n1 = n2 = 3, mu = 4, z = 0
    val df = Seq(1L, 2L, 9L, 3L, 8L, 4L, 7L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("t", "v")
    val r = TrendTests.runsTest(df, "t", "v").head()
    assert(r.getAs[Long]("median") == 4L)
    assert(r.getAs[Long]("n_above") == 3L && r.getAs[Long]("n_below") == 3L)
    assert(r.getAs[Long]("runs") == 4L)
    assert(r.getAs[Double]("expected_runs") == 4.0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("runsTest: clustering gives too few runs (z << 0), " +
    "oscillation too many (z >> 0)") {
    import spark.implicits._
    // distinct values so the lower median drops exactly one point
    val clustered = ((0 until 20).map(_.toLong) ++
      (0 until 20).map(i => 100L + i))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("t", "v")
    val rc = TrendTests.runsTest(clustered, "t", "v").head()
    assert(rc.getAs[Long]("runs") == 2L && rc.getAs[Double]("z") < -5.0)
    val alternating = (0 until 40)
      .map(i => (i.toLong, if (i % 2 == 0) i.toLong else 100L + i))
      .toDF("t", "v")
    val ra = TrendTests.runsTest(alternating, "t", "v").head()
    assert(ra.getAs[Long]("runs") >= 35L && ra.getAs[Double]("z") > 5.0)
  }

  test("seasonalMannKendall: flat daily cycle has S = 0 per season " +
    "(where plain MK sees a huge spurious S)") {
    import spark.implicits._
    // pure phase cycle TRUNCATED mid-cycle (9.5 cycles): within-season
    // series are constant -> zero seasonal variance, loudly refused;
    // plain MK on the same grid reads a spurious nonzero S from the
    // unbalanced cross-phase pairs the truncation leaves behind
    val df = (0 until 38).map(i =>
      (i.toLong, (i % 4).toLong, Seq(10L, 90L, 50L, 20L)(i % 4)))
      .toDF("t", "season", "v")
    val e = intercept[IllegalArgumentException](
      TrendTests.seasonalMannKendall(df, "t", "v", "season"))
    // all four seasons constant -> zero variance, loudly refused
    assert(e.getMessage.contains("zero variance"))
    val mk = TrendTests.mannKendall(
      df.select($"t", $"v"), "t", "v").head()
    assert(mk.getAs[Long]("s") != 0L) // the spurious cross-phase signal
  }

  test("seasonalMannKendall: trend + cycle — per-season S sums, " +
    "z from the total; matches per-season brute force") {
    import spark.implicits._
    val vals = (0 until 36).map(i =>
      (i.toLong, (i % 3).toLong,
        (i / 3).toLong * 2 + Seq(0L, 100L, 50L)(i % 3) + (i % 7)))
    val df = vals.toDF("t", "season", "v")
    val out = TrendTests.seasonalMannKendall(df, "t", "v", "season")
      .collect()
    def bruteS(g: Long): Long = {
      val xs = vals.filter(_._2 == g).sortBy(_._1).map(_._3)
      (for (i <- xs.indices; j <- i + 1 until xs.length)
        yield (xs(j) - xs(i)).sign.toLong).sum
    }
    out.foreach { r =>
      assert(r.getAs[Long]("s") == bruteS(r.getAs[Long]("season")))
    }
    val sTot = out.map(_.getAs[Long]("s")).sum
    assert(out.forall(_.getAs[Long]("s_total") == sTot))
    assert(out.head.getAs[Double]("z") > 3.0) // the planted uptrend
  }

  test("seasonalMannKendall: partitioning-invariant; duplicate " +
    "(season, t) refused") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val df = (0 until 120).map(i =>
      (i.toLong, (i % 6).toLong, rnd.nextInt(40).toLong))
      .toDF("t", "season", "v")
    val a = TrendTests.seasonalMannKendall(df.coalesce(1), "t", "v",
      "season").collect().map(_.toString).toSeq
    val b = TrendTests.seasonalMannKendall(df.repartition(7), "t", "v",
      "season").collect().map(_.toString).toSeq
    assert(a == b)
    val dup = df.unionByName(df.limit(1))
    val e = intercept[IllegalArgumentException](
      TrendTests.seasonalMannKendall(dup, "t", "v", "season"))
    assert(e.getMessage.contains("multiple rows"))
  }

  test("runsTest: partitioning-invariant; refuses constant series") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (0 until 200).map(i => (i.toLong, rnd.nextInt(50).toLong))
      .toDF("t", "v")
    val a = TrendTests.runsTest(df.coalesce(1), "t", "v").head().toSeq
    val b = TrendTests.runsTest(df.repartition(11), "t", "v").head().toSeq
    assert(a == b)
    val const = (0 until 10).map(i => (i.toLong, 7L)).toDF("t", "v")
    val e = intercept[IllegalArgumentException](
      TrendTests.runsTest(const, "t", "v"))
    assert(e.getMessage.contains("degenerate dichotomy"))
  }

  test("cochran-armitage: planted rising trend reads large +Z; flat reads ~0") {
    import spark.implicits._
    // tiers 1..5 with rates 10%,20%,...,50%: strong positive trend
    val rising = (1 to 5).flatMap { s =>
      (1 to 100).map(i => (s.toLong, i <= s * 10))
    }.toDF("s", "y")
    val zUp = TrendTests.cochranArmitage(rising.repartition(7), "s", "y")
      .head().getAs[Double]("z_ca")
    assert(zUp > 6.0, s"zUp=$zUp")
    val flat = (1 to 5).flatMap { s =>
      (1 to 100).map(i => (s.toLong, i <= 30))
    }.toDF("s", "y")
    val zFlat = TrendTests.cochranArmitage(flat, "s", "y")
      .head().getAs[Double]("z_ca")
    assert(zFlat == 0.0, s"zFlat=$zFlat")
    // reversing the scores flips the sign exactly
    val falling = rising.selectExpr("6 - s AS s", "y")
    val zDown = TrendTests.cochranArmitage(falling, "s", "y")
      .head().getAs[Double]("z_ca")
    assert(math.abs(zDown + zUp) < 1e-6, s"zDown=$zDown zUp=$zUp")
  }

  test("cochran-armitage hand-computed 2x2 equals the two-proportion z") {
    import spark.implicits._
    // scores 0/1: CA reduces to the pooled two-proportion z
    val rows = (Seq.fill(30)((0L, true)) ++ Seq.fill(70)((0L, false)) ++
      Seq.fill(50)((1L, true)) ++ Seq.fill(50)((1L, false)))
      .toDF("s", "y")
    val z = TrendTests.cochranArmitage(rows, "s", "y")
      .head().getAs[Double]("z_ca")
    val (p1, p0, pb) = (0.5, 0.3, 0.4)
    val want = (p1 - p0) / math.sqrt(pb * (1 - pb) * (1.0 / 100 + 1.0 / 100))
    assert(math.abs(z - want) < 1e-6, s"z=$z want=$want")
  }

  test("records test: monotone series records everything; ties are not records") {
    import spark.implicits._
    val inc = (1L to 50L).map(i => (i, i * 10)).toDF("t", "v")
    val r = TrendTests.recordsTest(inc, "t", "v").head()
    assert(r.getAs[Long]("records") == 50L)
    assert(r.getAs[Double]("z_records") > 20.0)
    // constant after the first: exactly 1 record (strict > pins ties out)
    val const = (1L to 50L).map(i => (i, 7L)).toDF("t", "v")
    assert(TrendTests.recordsTest(const, "t", "v").head()
      .getAs[Long]("records") == 1L)
  }

  test("records test: E[R] = H_n on any data; exchangeable data reads |z| small") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val sh = (1L to 400L).map(i => (i, rnd.nextInt(100000).toLong))
      .toDF("t", "v")
    val r = TrendTests.recordsTest(sh.repartition(9), "t", "v").head()
    val hn = (1 to 400).map(1.0 / _).sum
    assert(math.abs(r.getAs[Double]("e_records") - hn) < 1e-5)
    assert(math.abs(r.getAs[Double]("z_records")) < 3.0)
  }

  test("jonckheere matches the brute-force pairwise count with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val rows = (1 to 240).map(i =>
      ((i % 4 + 1).toLong, rnd.nextInt(12).toLong))
    val r = TrendTests.jonckheereTerpstra(rows.toDF("s", "v")
      .repartition(9), "s", "v").head()
    var jt2 = 0L
    for (a <- rows; b <- rows if a._1 < b._1) {
      if (a._2 < b._2) jt2 += 2
      else if (a._2 == b._2) jt2 += 1
    }
    assert(r.getAs[Long]("jt2") == jt2, s"got ${r.getAs[Long]("jt2")}")
    // E[2JT] = (N^2 - sum n_i^2) / 2 with four tiers of 60
    assert(r.getAs[Long]("e2") == (240L * 240 - 4 * 60 * 60) / 2)
  }

  test("jonckheere: planted rising tiers read large +Z, reversal flips it") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rising = (1 to 4).flatMap { s =>
      (1 to 80).map(_ => (s.toLong, s * 100L + rnd.nextInt(120)))
    }.toDF("s", "v")
    val zUp = TrendTests.jonckheereTerpstra(rising, "s", "v")
      .head().getAs[Double]("z_jt")
    assert(zUp > 8.0, s"zUp=$zUp")
    val zDown = TrendTests.jonckheereTerpstra(
      rising.selectExpr("5 - s AS s", "v"), "s", "v")
      .head().getAs[Double]("z_jt")
    assert(math.abs(zDown + zUp) < 1e-6)
  }

  test("jonckheere refuses constant values and fractional inputs") {
    import spark.implicits._
    assert(intercept[IllegalArgumentException] {
      TrendTests.jonckheereTerpstra(
        (1 to 20).map(i => ((i % 3).toLong, 7L)).toDF("s", "v"), "s", "v")
    }.getMessage.contains("values outside"))
    assert(intercept[IllegalArgumentException] {
      TrendTests.jonckheereTerpstra(
        Seq((1.5, 2L), (2.5, 3L)).toDF("s", "v"), "s", "v")
    }.getMessage.contains("integer"))
  }

  test("cochran-armitage refuses fractional scores and degenerate outcomes") {
    import spark.implicits._
    assert(intercept[IllegalArgumentException] {
      TrendTests.cochranArmitage(
        Seq((1.5, true), (2.5, false)).toDF("s", "y"), "s", "y")
    }.getMessage.contains("integer"))
    assert(intercept[IllegalArgumentException] {
      TrendTests.cochranArmitage(
        Seq((1L, true), (2L, true), (3L, true)).toDF("s", "y"), "s", "y")
    }.getMessage.contains("degenerate"))
  }
}
