package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend fit — the drift detector of a
  * corpus audit: is a source's quality score sinking over time, a
  * domain's document length creeping up, a feed's value decaying?
  * Closed-form simple regression per key from five sufficient
  * statistics, one map-side-combined aggregate — no iteration, no
  * solver.
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy − slope·Σx) / n
  *
  * Exactness discipline: x and y must arrive INTEGER-SCALED by the
  * caller (days, cents, basis points — the q25/q130 idiom), so all
  * five sums are exact BIGINTs; the closed form then evaluates in
  * doubles cast from exact integers with pinned association, making
  * slopes engine-bit-stable and SQL-replayable. (Accumulating raw
  * doubles would be partitioning-dependent; accumulating wide decimals
  * would hit Spark's and DuckDB's DIFFERENT decimal-multiply precision
  * adjustments.) Caller bound: n·max|x·y| must stay under 2⁶³ —
  * day-scale x and cent-scale y keep 100 TB row counts inside it.
  * Groups with fewer than 2 distinct x values report NULL slope
  * (vertical line), not a division error.
  *
  * Scale shape: ONE aggregate pass, shuffle carries groups×5 integer
  * sums; the closed form is a narrow projection over the group table.
  * (The iterative alternative — gradient descent per key — would be a
  * per-iteration corpus pass; sufficient statistics are why simple
  * regression is a one-pass, streaming-friendly aggregate.) */
object Trend {

  /** (keyCol, n, slope, intercept) from integer-scaled x/y columns. */
  def fit(df: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agg = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"),
      sum(y).as("sy"),
      sum(x * y).as("sxy"),
      sum(x * x).as("sxx"))
    // doubles from exact integer sums; association pinned to match the
    // oracle: (n·sxy − sx·sy) / (n·sxx − sx·sx), then (sy − slope·sx)/n
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double"); val sxxD = col("sxx").cast("double")
    val den = nD * sxxD - sxD * sxD
    agg
      .withColumn("slope", when(den === 0.0, lit(null).cast("double"))
        .otherwise((nD * sxyD - sxD * syD) / den))
      .withColumn("intercept", when(col("slope").isNull, lit(null).cast("double"))
        .otherwise((syD - col("slope") * sxD) / nD))
      .select(col(keyCol), col("n"), col("slope"), col("intercept"))
  }
}
