package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benjamini–Hochberg false-discovery-rate control over a battery of
  * segment-level tests — the missing closure of the per-segment test
  * family (q274's two-proportion z, q286's CMH): run one z-test per
  * nation/source/slice and a twentieth of your "significant" segments
  * are noise at α = .05; BH (1995) step-up is the standard correction
  * that still finds real effects (unlike Bonferroni): sort p
  * ascending, find the LARGEST rank i with p₍ᵢ₎ ≤ α·i/m, reject all
  * ranks ≤ i.
  *
  * The p-value uses the Zelen–Severo/Abramowitz–Stegun 26.2.17
  * polynomial normal CDF (|error| < 7.5e-8) as an EXPLICIT pinned
  * expression tree — not a library erf, whose implementations differ
  * across engines; both sides replay the identical double arithmetic,
  * and the step-up compares the 6-dp-ROUNDED p (the q261
  * compare-the-persisted-value rule) so the decision boundary
  * replays.
  *
  * Scale shape: the input IS the tests grid (≤ segments rows — built
  * upstream by one corpus aggregate); ranks and the step-up max run
  * on grid-bounded windows. */
object MultipleTesting {

  /** Φ(z) via A&S 26.2.17 — a fixed double expression tree. */
  def normalCdf(z: Column): Column = {
    val x = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * x)
    val poly = ((((lit(1.330274429) * t - lit(1.821255978)) * t +
      lit(1.781477937)) * t - lit(0.356563782)) * t + lit(0.319381530)) * t
    val pdf = exp(lit(-0.5) * x * x) * lit(0.3989422804014327)
    val upper = lit(1.0) - pdf * poly
    when(z >= 0, upper).otherwise(lit(1.0) - upper)
  }

  /** Two-sided p from a z column. */
  def twoSidedP(z: Column): Column =
    lit(2.0) * (lit(1.0) - normalCdf(abs(z)))

  /** BH step-up over a (segment, z) tests table: (segment, z, p, rank,
    * m, bh_threshold, reject), ordered by rank. `tests` must be
    * grid-sized (one row per segment). */
  def bhAdjust(tests: DataFrame, segmentCol: String, zCol: String,
               alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"bad alpha=$alpha")
    val base = tests
      .filter(col(zCol).isNotNull)
      .select(col(segmentCol), col(zCol).cast("double").as("z"),
        round(twoSidedP(col(zCol).cast("double")), 6).as("p"))
    // grid-bounded windows (the tests table is segments-sized)
    val wRank = Window.orderBy(col("p"), col(segmentCol))
    val wAll = Window.orderBy(col("p"), col(segmentCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("bh_threshold",
        round(lit(alpha) * col("rank").cast("double") /
          col("m").cast("double"), 6))
      .withColumn("__kstar", max(
        when(col("p") <= lit(alpha) * col("rank").cast("double") /
          col("m").cast("double"), col("rank"))).over(wAll))
      .select(col(segmentCol), round(col("z"), 6).as("z"), col("p"),
        col("rank"), col("m"), col("bh_threshold"),
        (col("__kstar").isNotNull && col("rank") <= col("__kstar"))
          .as("reject"))
      .orderBy(col("rank"))
  }

  /** Holm–Bonferroni step-down over the same tests table — FWER
    * control where [[bhAdjust]] controls FDR: when ONE false segment
    * alarm is expensive (a rollback, a page), Holm (1979) is the
    * uniformly-more-powerful replacement for plain Bonferroni:
    * ascending p, adjusted p₍ᵢ₎ = max_{j≤i} min(1, (m−j+1)·p₍ⱼ₎),
    * reject while adjusted ≤ α.
    *
    * Exactness: the same pinned A&S CDF p (6-dp); the step-down is a
    * running max over the grid-bounded rank window of one double
    * product, and the decision compares the 6-dp-ROUNDED adjusted p
    * to α (the compare-the-rounded rule) so the boundary replays. */
  def holmAdjust(tests: DataFrame, segmentCol: String, zCol: String,
                 alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"bad alpha=$alpha")
    val base = tests
      .filter(col(zCol).isNotNull)
      .select(col(segmentCol), col(zCol).cast("double").as("z"),
        round(twoSidedP(col(zCol).cast("double")), 6).as("p"))
    val wRank = Window.orderBy(col("p"), col(segmentCol))
    val wAll = Window.orderBy(col("p"), col(segmentCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("p"), col(segmentCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("__adj", least(lit(1.0),
        max((col("m") - col("rank") + 1).cast("double") * col("p"))
          .over(wCum)))
      .withColumn("p_holm", round(col("__adj"), 6))
      .select(col(segmentCol), round(col("z"), 6).as("z"), col("p"),
        col("rank"), col("m"), col("p_holm"),
        (col("p_holm") <= alpha).as("reject"))
      .orderBy(col("rank"))
  }
}
