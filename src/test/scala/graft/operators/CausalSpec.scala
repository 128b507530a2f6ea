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
}
