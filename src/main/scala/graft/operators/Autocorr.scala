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

  /** Cross-correlation function between TWO series on one grid — the
    * lead–lag diagnostic [[acf]] cannot give: does x LEAD y (peak at
    * positive lag: x_t correlates with y_{t+ℓ}), lag it, or move
    * coincident? The standard CCF normalization uses the full-series
    * moments (Box & Jenkins §11.1):
    *
    *   r_xy(ℓ) = Σ_t c_x(t)·c_y(t+ℓ) / √(Σc_x² · Σc_y²)
    *
    * Exactness: the [[acf]] discipline per series — centered values
    * are the exact decimal n·v − Σv cast to double ONCE, lag products
    * fold in position order (the q279 discipline), the denominator is
    * one √ of exact-fold products. Output: (lag, n_pairs, ccf) for
    * lag −maxLag..+maxLag, 6-dp.
    *
    * Scale shape: [[acf]]'s — the input must already BE a grid, ≤2¹²
    * positions; one pinned pass derives it; the lag join is
    * grid²-bounded. */
  def ccf(grid: DataFrame, tCol: String, xCol: String, yCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 256, s"bad maxLag=$maxLag")
    val spark = grid.sparkSession
    val gPin = Pinned.checkpoint(
      grid.select(col(tCol).cast("long").as("t"),
          col(xCol).cast("decimal(18,6)").as("x"),
          col(yCol).cast("decimal(18,6)").as("y"))
        .filter(col("t").isNotNull && col("x").isNotNull &&
          col("y").isNotNull))
    try {
      val g = gPin.df
      val n = g.count()
      require(n >= maxLag + 2 && n <= (1 << 12),
        s"ccf: $n grid positions (need in [${maxLag + 2}, 4096]) — " +
          "pre-aggregate onto a bounded time grid first")
      val w = Window.orderBy(col("t"))
      val idx = g.withColumn("rn", row_number().over(w))
      val tot = idx.agg(sum(col("x")).cast("decimal(38,6)").as("__sx"),
        sum(col("y")).cast("decimal(38,6)").as("__sy"))
      val c = idx.crossJoin(broadcast(tot))
        .select(col("rn"),
          (col("x") * n - col("__sx")).cast("decimal(38,6)")
            .cast("double").as("cx"),
          (col("y") * n - col("__sy")).cast("decimal(38,6)")
            .cast("double").as("cy"))
      def sortedFold(products: DataFrame): DataFrame =
        products.groupBy(col("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            aggregate(
              transform(array_sort(collect_list(struct(col("rn"),
                col("term")))),
                s => s.getField("term")),
              lit(0.0), (acc, x) => acc + x).as("__num"))
      import spark.implicits._
      val lags = (-maxLag to maxLag).map(_.toLong).toDF("lag")
      val cross = sortedFold(c.as("a").crossJoin(broadcast(lags))
        .join(c.select(col("rn").as("rn2"), col("cy").as("cy2")).as("b"),
          col("rn2") === col("rn") + col("lag"))
        .select(col("lag"), col("rn"),
          (col("cx") * col("cy2")).as("term")))
      val sxx = sortedFold(c.select(lit(0L).as("lag"), col("rn"),
        (col("cx") * col("cx")).as("term"))).head().getDouble(2)
      val syy = sortedFold(c.select(lit(0L).as("lag"), col("rn"),
        (col("cy") * col("cy")).as("term"))).head().getDouble(2)
      require(sxx != 0.0 && syy != 0.0,
        "ccf: a constant series — zero variance")
      val den = math.sqrt(sxx * syy)
      val out = cross
        .select(col("lag"), col("n_pairs"),
          round(col("__num") / lit(den), 6).as("ccf"))
        .orderBy(col("lag"))
      Grids.collectBounded(out, "ccf lag grid")
    } finally gPin.release()
  }

  /** Partial autocorrelation via Durbin–Levinson (Durbin 1960; Box &
    * Jenkins §3.2) — the AR-order diagnostic the raw [[acf]] cannot
    * be: ACF of an AR(p) process decays forever, PACF CUTS OFF at p;
    * reading where φ_kk dies is how an order is picked. The recursion
    * on the lag-1..L autocorrelations:
    *
    *   φ_kk = (ρ_k − Σ_{j<k} φ_{k−1,j}·ρ_{k−j}) /
    *          (1 − Σ_{j<k} φ_{k−1,j}·ρ_j),
    *   φ_kj = φ_{k−1,j} − φ_kk·φ_{k−1,k−j}
    *
    * Determinism contract (the holtWinters class): inputs are the
    * 6-dp-rounded [[acf]] values both engines already agree on; the
    * recursion folds driver-side with ascending-j sums (0-seeded) that
    * the oracle's recursive CTE replays carrying the φ DOUBLE[] list.
    * A unit root in the sample ACF (denominator 0) refuses loudly.
    * Output: (lag, acf, pacf) for lag 1..maxLag, 6-dp at output.
    *
    * Scale shape: [[acf]]'s; the recursion is O(maxLag²) ≤ 256² on
    * the driver. */
  def pacf(grid: DataFrame, tCol: String, yCol: String,
           maxLag: Int): DataFrame = {
    val spark = grid.sparkSession
    val rows = acf(grid, tCol, yCol, maxLag).collect()
      .filter(_.getLong(0) >= 1L).sortBy(_.getLong(0))
    val rho = rows.map(_.getDouble(2)) // rho(1)..rho(L), 6-dp published
    val l = rho.length
    var phi = Array.empty[Double] // phi(k-1, 1..k-1)
    val out = new Array[(Long, Double, Double)](l)
    var k = 1
    while (k <= l) {
      var num = 0.0; var den = 0.0; var j = 1
      while (j < k) {
        num += phi(j - 1) * rho(k - j - 1)
        den += phi(j - 1) * rho(j - 1)
        j += 1
      }
      val dd = 1.0 - den
      require(dd != 0.0,
        s"pacf: unit denominator at lag $k — the sample ACF is on a " +
          "unit root; the recursion is undefined")
      val pkk = (rho(k - 1) - num) / dd
      val next = new Array[Double](k)
      j = 1
      while (j < k) {
        next(j - 1) = phi(j - 1) - pkk * phi(k - j - 1)
        j += 1
      }
      next(k - 1) = pkk
      phi = next
      out(k - 1) = (k.toLong, rho(k - 1), pkk)
      k += 1
    }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{StructType, StructField,
      LongType, DoubleType}
    spark.createDataFrame(
      out.toSeq.map(t => org.apache.spark.sql.Row(t._1, t._2, t._3))
        .asJava,
      StructType(Seq(
        StructField("lag", LongType), StructField("acf", DoubleType),
        StructField("pacf", DoubleType))))
      .select(col("lag"), col("acf"), round(col("pacf"), 6).as("pacf"))
      .orderBy(col("lag"))
  }
  /** Durbin–Watson statistic of the DETRENDED grid — the standard
    * "are my regression residuals serially correlated" read, reported
    * with its von Neumann ratio face (VN = DW·n/(n−1)) and the implied
    * lag-1 residual correlation (ρ̂ ≈ 1 − DW/2). DW ≈ 2 is white;
    * DW → 0 is positive serial correlation (every OLS standard error
    * downstream is overstated), DW → 4 negative. Complements
    * [[ljungBox]]: LB tests many lags jointly on the raw series, DW is
    * the single-lag residual diagnostic tied to a specific FIT.
    *
    * The fit is the exact-ledger OLS line (trend) over grid positions;
    * residuals are per-row doubles off the ledger-closed (a, b) — the
    * same value in any engine — and both quadratic forms cumulate as
    * DECIMAL(38,12) casts of per-row doubles (order-independent, the
    * nelsonAalen replay pattern).
    *
    * Scale shape: one exact ledger aggregate + one lag window over
    * GRID rows (bounded by the acf contract). */
  def durbinWatson(grid: DataFrame, tCol: String, yCol: String): DataFrame = {
    val g = grid.select(col(tCol).as("__t"),
        col(yCol).cast("decimal(18,6)").as("__y"))
      .filter(col("__t").isNotNull && col("__y").isNotNull)
    Pinned.withCheckpoint(g) { gg =>
      val n = gg.count()
      require(n >= 8 && n <= (1L << 12),
        s"durbinWatson: $n grid positions outside [8, 4096]")
      val base = gg.withColumn("__i",
        (row_number().over(Window.orderBy(col("__t"))) - 1)
          .cast("decimal(18,6)"))
      val r = base.agg(
        sum(col("__i").cast("decimal(38,12)")).as("sx"),
        sum(col("__y").cast("decimal(38,12)")).as("sy"),
        sum((col("__i") * col("__i")).cast("decimal(38,12)")).as("sxx"),
        sum((col("__i") * col("__y")).cast("decimal(38,12)")).as("sxy"))
        .head()
      val Seq(sx, sy, sxx, sxy) = (0 to 3).map(i => BigDecimal(r.getDecimal(i)))
      val den = sxx.toDouble * n - sx.toDouble * sx.toDouble
      require(den != 0.0, "durbinWatson: degenerate time axis")
      val b = (sxy.toDouble * n - sx.toDouble * sy.toDouble) / den
      val a = (sy.toDouble - b * sx.toDouble) / n
      val w = Window.orderBy(col("__t"))
      val res = base.withColumn("__e",
          col("__y").cast("double") - lit(a) - lit(b) * col("__i").cast("double"))
        .withColumn("__ep", lag(col("__e"), 1).over(w))
      val agg = res.agg(
        sum((col("__e") * col("__e")).cast("decimal(38,12)")).as("ss"),
        sum(when(col("__ep").isNotNull,
          (col("__e") - col("__ep")) * (col("__e") - col("__ep")))
          .cast("decimal(38,12)")).as("sd")).head()
      val ss = BigDecimal(agg.getDecimal(0)).toDouble
      val sd = BigDecimal(agg.getDecimal(1)).toDouble
      require(ss > 0, "durbinWatson: zero residual variance (exact " +
        "linear series) — serial correlation undefined")
      val dw = sd / ss
      val spark = grid.sparkSession
      import spark.implicits._
      Seq((n, dw, dw * n / (n - 1).toDouble, 1.0 - dw / 2.0, b, a))
        .toDF("n", "dw", "von_neumann", "rho1_implied", "trend_slope",
          "trend_intercept")
        .select(col("n"), round(col("dw"), 6).as("dw"),
          round(col("von_neumann"), 6).as("von_neumann"),
          round(col("rho1_implied"), 6).as("rho1_implied"),
          // trend terms can be cent-scaled: floor-scaling (the Causal
          // pattern) replays at any magnitude where round(,6) does not
          (floor(col("trend_slope") * lit(10000.0)) / lit(10000.0))
            .as("trend_slope"),
          (floor(col("trend_intercept") * lit(10000.0)) / lit(10000.0))
            .as("trend_intercept"))
    }
  }
}
