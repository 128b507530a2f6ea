package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sample autocorrelation function on a time grid — the correlogram
  * under the monitoring family: ACF(k) near zero at all lags says the
  * de-seasonalised series is white (q229's residual check done
  * right); a slow ACF decay says shocks persist (CUSUM will fire
  * late); a spike at lag 24 on hourly data is un-modelled seasonality.
  * Standard estimator (Box & Jenkins §2.1.5), with the SAME global
  * mean and denominator at every lag:
  *
  *   r(k) = Σ_{t=1..n−k} (y_t − ȳ)(y_{t+k} − ȳ) / Σ_t (y_t − ȳ)²
  *
  * Exactness: with S = Σy over the n-position grid, each term is the
  * scaled form (n·y_t − S)(n·y_{t+k} − S): the centered values n·y − S
  * are EXACT DECIMALs (y enters as DECIMAL(18,6)); their products
  * would overflow 38-digit decimals (the q262 lesson), so each factor
  * casts to double ONCE and the per-lag products fold in POSITION
  * ORDER via the sorted-list fold (the q279 discipline) — determinism
  * without unbounded precision. One division per lag, 6-dp.
  *
  * Scale shape: the input must already BE a grid (the Seasonal
  * idiom), loudly bounded at 2¹² positions; lags join positionally
  * (row_number over the grid) so calendar gaps cannot silently
  * misalign pairs — one grid² -bounded equi-join on rn, then a
  * lags-grid aggregate. */
object Autocorr {

  /** (lag, n_pairs, acf) for lag 0..maxLag, ordered by lag. */
  def acf(grid: DataFrame, tCol: String, yCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 256, s"bad maxLag=$maxLag")
    // the grid input is usually itself a corpus aggregate — pin it so
    // the require/total/lag-join branches read 4096 rows, not the
    // corpus (the round's scan-count audit class)
    val spark = grid.sparkSession
    val gPin = Pinned.checkpoint(
      grid.select(col(tCol).cast("long").as("t"),
          col(yCol).cast("decimal(18,6)").as("y"))
        .filter(col("t").isNotNull && col("y").isNotNull))
    val g = gPin.df
    val n = g.count()
    require(n >= maxLag + 2 && n <= (1 << 12),
      s"acf: $n grid positions (need in [${maxLag + 2}, 4096]) — " +
        "pre-aggregate onto a bounded time grid first (the Seasonal idiom)")
    val w = Window.orderBy(col("t")) // grid-bounded by the require above
    val idx = g.withColumn("rn", row_number().over(w))
    val tot = idx.agg(sum(col("y")).cast("decimal(38,6)").as("__s"))
    // centered-scaled values: n·y − S, exact decimal cast to double ONCE
    val c = idx.crossJoin(broadcast(tot))
      .select(col("rn"),
        (col("y") * n - col("__s")).cast("decimal(38,6)").cast("double")
          .as("cy"))
    import spark.implicits._
    val lags = (0 to maxLag).map(_.toLong).toDF("lag")
    val pairs = c.as("a").crossJoin(broadcast(lags))
      .join(c.select(col("rn").as("rn2"), col("cy").as("cy2")).as("b"),
        col("rn2") === col("rn") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        aggregate(
          transform(array_sort(collect_list(struct(col("rn"),
            (col("cy") * col("cy2")).as("term")))),
            s => s.getField("term")),
          lit(0.0), (acc, x) => acc + x).as("__num"))
    val den = pairs.filter(col("lag") === 0)
      .select(col("__num").as("__den")).head().getDouble(0)
    // a constant grid has zero variance — ACF undefined; fail loudly
    // rather than let ANSI throw DIVIDE_BY_ZERO deep in the plan
    require(den != 0.0, "acf: constant series — zero variance at lag 0")
    val out = pairs
      .select(col("lag"), col("n_pairs"),
        round(col("__num") / lit(den), 6).as("acf"))
      .orderBy(col("lag"))
    import scala.jdk.CollectionConverters._
    try spark.createDataFrame(out.collect().toSeq.asJava, out.schema)
    finally gPin.release()
  }

  /** Ljung–Box whiteness test (Ljung & Box 1978) — the scalar verdict
    * on the [[acf]] trajectory: is the series (typically a fit's
    * residuals, q173/q306) distinguishable from white noise at all?
    *
    *   Q(h) = n(n+2) · Σ_{k=1..h} ρ̂_k² / (n−k),  χ²_h under H₀
    *
    * reported CUMULATIVELY per lag (the practitioner reads where Q
    * starts exploding, not one pinned h). Determinism: ρ̂_k are the
    * 6-dp-rounded acf values BOTH engines already agree on, and the
    * cumulative fold runs in lag order — bit-identical replay. Output:
    * (lag, acf, q_lb, df) for lag 1..maxLag.
    *
    * Scale shape: [[acf]]'s (one grid²-bounded lag join); the Q fold
    * is O(maxLag) on the driver. */
  def ljungBox(grid: DataFrame, tCol: String, yCol: String,
               maxLag: Int): DataFrame = {
    val spark = grid.sparkSession
    val rows = acf(grid, tCol, yCol, maxLag).collect()
    val n = rows.find(_.getLong(0) == 0L).get.getLong(1) // pairs at lag 0
    val factor = n.toDouble * (n + 2).toDouble
    var cum = 0.0
    val out = rows.filter(_.getLong(0) >= 1L).sortBy(_.getLong(0))
      .map { r =>
        val k = r.getLong(0); val rho = r.getDouble(2)
        cum += rho * rho / (n - k).toDouble
        org.apache.spark.sql.Row(k, rho, factor * cum, k)
      }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{StructType, StructField,
      LongType, DoubleType}
    spark.createDataFrame(out.toSeq.asJava, StructType(Seq(
      StructField("lag", LongType), StructField("acf", DoubleType),
      StructField("q_lb", DoubleType), StructField("df", LongType))))
      .select(col("lag"), col("acf"), round(col("q_lb"), 6).as("q_lb"),
        col("df"))
      .orderBy(col("lag"))
  }
}
