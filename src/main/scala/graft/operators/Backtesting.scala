package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kupiec proportion-of-failures (POF) VaR backtest (Kupiec 1995) —
  * the validation half the extreme-value family (q379 Gumbel, q359
  * Hill) leaves open: a fitted "95th-percentile worst hour" threshold
  * is only as good as its OUT-OF-SAMPLE breach rate, and the POF
  * likelihood ratio tests exactly that:
  *
  *   LR = −2[ (n−x)ln(1−p) + x·ln p − (n−x)ln(1−x̂) − x·ln x̂ ]
  *
  * with x breaches in n held-out periods, x̂ = x/n, nominal rate p.
  * LR ~ χ²(1) under a correct threshold; LR > 3.84 rejects at 5% —
  * in EITHER direction (too many breaches = underestimated risk, too
  * few = capital wasted; the two-sided property point estimates hide).
  *
  * Split discipline: the threshold is the exact type-1 order statistic
  * at rank ⌈q·n₁⌉ over the FIRST n//2 periods (by time order — a
  * random split would leak the future into the estimate); breaches
  * count strictly-greater exceedances in the rest.
  *
  * Exactness: the split, the rank threshold and the breach counts are
  * exact integers; ln only at the close (x = 0 and x = n use the
  * 0·ln 0 = 0 limit explicitly). One row: (n_train, n_test,
  * var_level, expected_rate, breaches, breach_rate, lr_pof).
  *
  * Scale shape: the input must already BE a bounded time grid; one
  * row_number split + one value-census rank + one count. */
object Backtesting {

  def kupiecPof(df: DataFrame, tCol: String, vCol: String,
                qNum: Int, qDen: Int): DataFrame = {
    require(qDen > 0 && qNum * 2 > qDen && qNum < qDen,
      s"kupiecPof: q = $qNum/$qDen outside (0.5, 1)")
    val g = df.select(col(tCol).cast("long").as("__t"),
        col(vCol).cast("long").as("__v"))
      .filter(col("__t").isNotNull && col("__v").isNotNull)
    val spark = df.sparkSession
    Pinned.withCheckpoint(g) { gg =>
      val n = gg.count()
      require(n >= 40 && n <= (1 << 16),
        s"kupiecPof: $n grid positions outside [40, 65536]")
      val nTrain = n / 2
      val w = Window.orderBy(col("__t")) // grid-bounded by the require
      val split = gg.withColumn("__i", row_number().over(w).cast("long"))
      val train = split.filter(col("__i") <= nTrain)
      val test = split.filter(col("__i") > nTrain)
      // exact rank-⌈q·n₁⌉ threshold off the train half's value census
      val wv = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val varLevel = train.groupBy(col("__v"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__hi", sum(col("__c")).over(wv))
        .filter(col("__hi") >= lit((qNum * nTrain + qDen - 1) / qDen))
        .agg(min(col("__v"))).head().getLong(0)
      val r = test.agg(count(lit(1)).as("nt"),
        sum(when(col("__v") > varLevel, 1L).otherwise(0L)).as("x")).head()
      val (nt, x) = (r.getLong(0), r.getLong(1))
      val p = 1.0 - qNum.toDouble / qDen.toDouble
      val xhat = x.toDouble / nt.toDouble
      def xlnx(k: Long, q: Double): Double =
        if (k == 0) 0.0 else k.toDouble * math.log(q) // 0·ln 0 = 0
      val lr = -2.0 * (xlnx(nt - x, 1.0 - p) + xlnx(x, p) -
        xlnx(nt - x, 1.0 - xhat) - xlnx(x, xhat))
      spark.range(1).select(lit(nTrain).as("n_train"), lit(nt).as("n_test"),
        lit(varLevel).as("var_level"),
        round(lit(p), 6).as("expected_rate"),
        lit(x).as("breaches"), round(lit(xhat), 6).as("breach_rate"),
        round(lit(lr), 6).as("lr_pof"))
    }
  }
}
