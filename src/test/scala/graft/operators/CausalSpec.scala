package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Proof obligations for the causal family: hand-computed DiD on a
  * planted effect, the parallel-trends pre-check catching a planted
  * divergence, RD recovering a planted discontinuity while a plain
  * mean-difference would not, partition invariance, and the loud
  * refusals on degenerate designs. */
class CausalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // (value, tick, treated, post): control sits at 10 + tick, treated
  // at 20 + tick pre and 20 + tick + 7 post -> did = 7 exactly, both
  // pre-slopes = 1 (parallel)
  private def didRows(effect: Long) = (for {
    tick <- 1L to 10L
    g <- Seq(false, true)
  } yield {
    val post = tick > 5
    val base = if (g) 20L + tick else 10L + tick
    (base + (if (g && post) effect else 0L), tick, g, post)
  }).toDF("v", "tick", "g", "p")

  test("hand-computed DiD recovers the planted effect with parallel pre-slopes") {
    val out = Causal.diffInDiff(didRows(7), "v", "tick", col("g"), col("p"))
      .head()
    assert(out.getAs[Double]("did") == 7.0)
    assert(out.getAs[Double]("pre_slope_t") == 1.0)
    assert(out.getAs[Double]("pre_slope_c") == 1.0)
    assert(out.getAs[Double]("pre_slope_gap") == 0.0)
    assert(out.getAs[Long]("n_t_pre") == 5L && out.getAs[Long]("n_c_post") == 5L)
  }

  test("a planted pre-trend divergence shows up in pre_slope_gap") {
    // treated pre-period trends at 3 per tick instead of 1
    val rows = didRows(0).withColumn("v",
      when(col("g") && !col("p"), col("v") + col("tick") * 2).otherwise(col("v")))
    val out = Causal.diffInDiff(rows, "v", "tick", col("g"), col("p")).head()
    assert(out.getAs[Double]("pre_slope_t") == 3.0)
    assert(out.getAs[Double]("pre_slope_gap") == 2.0)
  }

  test("DiD refuses a missing cell and a degenerate pre-period time axis") {
    val threeCells = didRows(1).filter(!(col("g") && col("p")))
    assert(intercept[IllegalArgumentException] {
      Causal.diffInDiff(threeCells, "v", "tick", col("g"), col("p"))
    }.getMessage.contains("four"))
    val oneTick = didRows(1).withColumn("tick",
      when(!col("p"), lit(3L)).otherwise(col("tick")))
    assert(intercept[IllegalArgumentException] {
      Causal.diffInDiff(oneTick, "v", "tick", col("g"), col("p"))
    }.getMessage.contains("degenerate"))
  }

  // y = 2x + 100 left of 0, y = 2x + 150 right -> gap 50, slopes 2
  private def rdRows = (-20L to 20L).filter(_ != 0)
    .map(x => (x, 2 * x + (if (x >= 0) 150L else 100L)))
    .toDF("x", "y")

  test("RD recovers a planted discontinuity exactly; means alone would not") {
    val out = Causal.regressionDiscontinuity(rdRows, "x", "y",
      cutoff = 0.0, bandwidth = 20.0).head()
    assert(out.getAs[Double]("gap") == 50.0)
    assert(out.getAs[Double]("slope_left") == 2.0)
    assert(out.getAs[Double]("slope_right") == 2.0)
    assert(out.getAs[Double]("intercept_left") == 100.0)
    assert(out.getAs[Double]("intercept_right") == 150.0)
    assert(out.getAs[Double]("r2_left") == 1.0 && out.getAs[Double]("r2_right") == 1.0)
  }

  test("RD bandwidth actually scopes the fit and refuses an empty side") {
    val narrow = Causal.regressionDiscontinuity(rdRows, "x", "y",
      cutoff = 0.0, bandwidth = 5.0).head()
    assert(narrow.getAs[Long]("n_left") == 5L && narrow.getAs[Long]("n_right") == 5L)
    assert(narrow.getAs[Double]("gap") == 50.0)
    val oneSided = rdRows.filter(col("x") > 0)
    assert(intercept[IllegalArgumentException] {
      Causal.regressionDiscontinuity(oneSided, "x", "y", 0.0, 20.0)
    }.getMessage.contains("no rows"))
  }

  test("both estimators are partition-invariant (exact decimal ledgers)") {
    val a = Causal.diffInDiff(didRows(3), "v", "tick", col("g"), col("p"))
      .head().toString
    val b = Causal.diffInDiff(didRows(3).repartition(7), "v", "tick",
      col("g"), col("p")).head().toString
    assert(a == b)
    val c = Causal.regressionDiscontinuity(rdRows, "x", "y", 0.0, 20.0)
      .head().toString
    val e = Causal.regressionDiscontinuity(rdRows.repartition(5), "x", "y",
      0.0, 20.0).head().toString
    assert(c == e)
  }
  test("oaxacaBlinder: identity gap = explained + unexplained; a pure " +
      "composition gap is fully explained") {
    import spark.implicits._
    // both groups share y = 10x + 5 exactly; group A just has larger x
    // -> the whole gap is endowments, unexplained = 0
    val comp = ((1L to 10L).map(x => (true, x + 10L, 10 * (x + 10L) + 5L)) ++
      (1L to 10L).map(x => (false, x, 10 * x + 5L)))
      .toDF("g", "x", "y")
    val out = Causal.oaxacaBlinder(comp, col("g"), "x", "y").head()
    assert(out.getAs[Double]("unexplained") == 0.0)
    assert(out.getAs[Double]("explained_by_x") == 100.0) // 10 * (15.5-5.5)
    assert(out.getAs[Double]("gap") == 100.0)
    // a pure coefficient gap: same x, A pays double slope
    val coef = ((1L to 10L).map(x => (true, x, 20 * x)) ++
      (1L to 10L).map(x => (false, x, 10 * x))).toDF("g", "x", "y")
    val out2 = Causal.oaxacaBlinder(coef, col("g"), "x", "y").head()
    assert(out2.getAs[Double]("explained_by_x") == 0.0)
    assert(out2.getAs[Double]("gap") == out2.getAs[Double]("unexplained"))
  }

  test("oaxacaBlinder refuses missing or degenerate groups") {
    import spark.implicits._
    val one = (1L to 10L).map(x => (true, x, x)).toDF("g", "x", "y")
    assert(intercept[IllegalArgumentException] {
      Causal.oaxacaBlinder(one, col("g"), "x", "y")
    }.getMessage.contains("both groups"))
    val degen = ((1L to 5L).map(_ => (true, 3L, 7L)) ++
      (1L to 5L).map(x => (false, x, x))).toDF("g", "x", "y")
    assert(intercept[IllegalArgumentException] {
      Causal.oaxacaBlinder(degen, col("g"), "x", "y")
    }.getMessage.contains("degenerate"))
  }
  test("eventStudy: flat pre gaps, the planted post trajectory, and " +
      "NULL means where a tick misses a group") {
    import spark.implicits._
    // control 10+tick; treated 20+tick, +5 at ticks 6-7, +9 at 8-10
    val rows = (for {
      tick <- 1L to 10L; g <- Seq(false, true)
    } yield {
      val eff = if (g && tick >= 8) 9L else if (g && tick >= 6) 5L else 0L
      ((if (g) 20L + tick else 10L + tick) + eff, tick, g)
    }).toDF("v", "tick", "g")
    val out = Causal.eventStudy(rows, "v", "tick", col("g"), eventTick = 6L)
      .collect()
    val gaps = out.map(r => r.getAs[Long]("rel_tick") ->
      r.getAs[Double]("gap")).toMap
    assert((-5L to -1L).forall(gaps(_) == 10.0), gaps)
    assert(gaps(0L) == 15.0 && gaps(1L) == 15.0)
    assert((2L to 4L).forall(gaps(_) == 19.0))
    // a tick missing the treated side reads NULL mean/gap, not a drop
    val holes = rows.filter(!(col("g") && col("tick") === 3L))
    val h = Causal.eventStudy(holes, "v", "tick", col("g"), 6L)
      .filter(col("rel_tick") === -3L).head()
    assert(h.getAs[Long]("n_t") == 0L)
    assert(h.isNullAt(h.fieldIndex("mean_t")))
    assert(h.isNullAt(h.fieldIndex("gap")))
  }

  test("placeboDid: a huge planted effect ranks above every placebo; " +
      "the mixer's splits are balanced enough to estimate") {
    import spark.implicits._
    // 200 units x (pre, post); REAL treated (u % 2 = 1) gains +1000
    // post — hash placebos mix treated and control, so each placebo
    // did sits near 500, strictly below the real 1000
    val rows = (for {
      u <- 0L until 200L; p <- Seq(false, true)
    } yield {
      val y = 100L + (if (p && u % 2 == 1) 1000L else 0L)
      (y, u, u % 2 == 1, p)
    }).toDF("v", "u", "g", "p")
    val out = Causal.placeboDid(rows, "v", "u", col("g"), col("p"), k = 16)
      .head()
    assert(out.getAs[Double]("did_real") == 1000.0)
    assert(out.getAs[Int]("n_ge_real") == 0)
    assert(out.getAs[Double]("p_value") == math.rint(1.0 / 17 * 1e6) / 1e6)
    assert(out.getAs[Double]("placebo_abs_max") < 1000.0)
  }

  test("placeboDid: a null effect ranks inside the placebo cloud; " +
      "refuses k too large for the unit count") {
    import spark.implicits._
    // outcome independent of the real split -> real did is hash noise
    val rows = (for {
      u <- 0L until 100L; p <- Seq(false, true)
    } yield ((u * 37 % 101) + (if (p) 5L else 0L), u, u % 2 == 1, p))
      .toDF("v", "u", "g", "p")
    val out = Causal.placeboDid(rows, "v", "u", col("g"), col("p"), k = 8)
      .head()
    assert(out.getAs[Double]("p_value") > 0.1, out.toString)
    val tiny = rows.filter(col("u") < 2)
    assert(intercept[IllegalArgumentException] {
      Causal.placeboDid(tiny, "v", "u", col("g"), col("p"), k = 16)
    }.getMessage.contains("empty"))
  }

  test("placeboDid: adjacent pseudo-assignments decorrelate over a " +
      "clustered unit-id range (the r17 advisor finding)") {
    import spark.implicits._
    // replay the operator's mixer directly over a contiguous id block —
    // the worst case for the old +97*j additive mix — and require every
    // adjacent-j pair to disagree on a healthy fraction of units
    def bit(u: Long, j: Long): Int = {
      val h1 = ((math.abs(u) % 2147483648L) * 2654435761L +
        j * 2246822519L) % 2147483648L
      val h2 = (h1 * 1597334677L) % 2147483648L
      (((h2 >> 15) ^ (h2 >> 7)) % 2).toInt
    }
    val units = 0L until 512L
    for (j <- 1L until 16L) {
      val agree = units.count(u => bit(u, j) == bit(u, j + 1))
      val frac = agree.toDouble / units.size
      assert(frac > 0.35 && frac < 0.65,
        s"adjacent assignments j=$j,${j + 1} agree on $frac of units")
      val ones = units.count(bit(_, j) == 1).toDouble / units.size
      assert(ones > 0.35 && ones < 0.65, s"j=$j split is $ones treated")
    }
  }
}
