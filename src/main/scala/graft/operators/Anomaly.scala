package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window z-score anomaly detection in EXACT integer
  * arithmetic — the streaming-telemetry outlier flag ("this metric
  * jumped k sigma above its own recent history") as a pure window
  * computation, one shuffle on the partition key.
  *
  * The z-score test |v - mean| > k·stddev is normally irreproducible
  * across engines (sqrt + division round differently); multiplied
  * through by n² it becomes a pure integer inequality on the scaled
  * values:
  * {{{
  *   (n·v − sum)²  >  k² · (n·sumsq − sum²)
  * }}}
  * — left side is (n·(v−mean))², right side is k²·n²·variance; both
  * are exact BIGINTs, so the flag (and therefore the DuckDB oracle
  * hash) is bit-deterministic. Callers pre-scale fractional values to
  * integers (e.g. cents); with window w and |v| ≤ V the largest term
  * is k²·w²·V² — long-safe for V up to ~10⁷ at w=20, k≤3.
  *
  * The window is strictly TRAILING (rows -w..-1): the tested value
  * never contaminates its own baseline, and the first rows of a key
  * are unflaggable until `minPeriods` of history exist — matching how
  * a production monitor warms up. Ordering must be made total by the
  * caller's `orderBy` columns or flags are nondeterministic under
  * equal timestamps.
  */
object Anomaly {

  /** @param valueCol integer-typed (pre-scaled) metric column
    * @return input plus `n_prev` (trailing history size) and
    *         `is_anomaly` */
  def rollingZ(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[String],
               valueCol: String, window: Int, k: Int,
               minPeriods: Int): DataFrame = {
    require(window >= 1 && k >= 1 && minPeriods >= 2,
      s"bad params (window=$window k=$k minPeriods=$minPeriods)")
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(orderBy.map(col): _*)
      .rowsBetween(-window, -1)
    val v = col(valueCol)
    val n = count(v).over(w)
    val s = sum(v).over(w)
    val q = sum(v * v).over(w)
    df.withColumn("n_prev", n)
      .withColumn("__dev", n * v - s)
      .withColumn("__var_n2", n * q - s * s)
      .withColumn("is_anomaly",
        col("n_prev") >= minPeriods &&
          col("__dev") * col("__dev") > lit(k.toLong * k) * col("__var_n2"))
      .drop("__dev", "__var_n2")
  }

  /** Global robust outliers by median absolute deviation — the
    * breakdown-resistant companion to [[rollingZ]]'s mean/σ: one
    * contaminated tail inflates σ and HIDES its own outliers
    * (masking); the median and MAD ignore up to half the data, so the
    * fence stays put (Hampel 1974; the robust-z rule
    * |x − med| > k·1.4826·MAD, 1.4826 = 1/Φ⁻¹(3/4) making MAD a σ
    * estimate under normality).
    *
    * Exactness (no float medians anywhere): `valueCol` is integral
    * (micro-scale first); the median and MAD ride the
    * [[ExactQuantile]] two-phase machinery DOUBLED — med2 = the SUM of
    * the two middle order statistics (= 2·median, an exact BIGINT even
    * when the median is a .5), dev2 = |2x − med2| exact, mad4 = the
    * sum of dev2's two middles (= 4·MAD). The fence
    * 2·dev2 > k·1.4826…·mad4 compares one exact BIGINT against one
    * fixed double product — deterministic on any engine.
    *
    * Output: outlier rows (idCol, value, robust_z) + (med2, mad4, n)
    * repeated — three corpus scans (values, deviations, fence), each
    * with bounded post-shuffle structure. */
  def madOutliers(df: DataFrame, idCol: String, valueCol: String,
                  k: Double = 3.0): DataFrame = {
    val Consistency = 1.482602218505602 // 1/Φ⁻¹(3/4), spec-pinned
    val v = df.select(col(idCol), col(valueCol).cast("long").as("__x"))
      .filter(col("__x").isNotNull)
      .localCheckpoint() // three passes below
    val n = v.count()
    require(n >= 2, s"madOutliers needs >= 2 rows, got $n")
    def twoMiddleSum(d: DataFrame, c: String): Long =
      ExactQuantile.globalRanks(d, c, Seq((n + 1) / 2, n / 2 + 1).distinct)
        .collect().map(r => r.getLong(1) *
          (if ((n + 1) / 2 == n / 2 + 1) 2 else 1)).sum
    val med2 = twoMiddleSum(v, "__x")
    val dev = v.withColumn("__dev2", abs(col("__x") * 2 - med2))
    val mad4 = twoMiddleSum(dev.select(col("__dev2")), "__dev2")
    require(mad4 > 0,
      "madOutliers: MAD is 0 (over half the values are identical) — " +
        "every deviation is infinitely many MADs out; use a rule that " +
        "handles discrete mass, e.g. exact frequency cuts")
    dev.filter(col("__dev2").cast("double") * 2 > lit(k * Consistency) * mad4)
      .select(col(idCol), col("__x").as("value"),
        round((col("__dev2").cast("double") / 2) /
          lit(Consistency * mad4 / 4), 6).as("robust_z"),
        lit(med2).as("med2"), lit(mad4).as("mad4"), lit(n).as("n"))
      .orderBy(col(idCol))
  }
}
