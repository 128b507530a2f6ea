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
}
