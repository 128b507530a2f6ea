package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Burstiness audit — the Fano factor (index of dispersion) of each
  * group's per-period event counts over a DENSE time grid: D = σ²/μ
  * is 1 for a Poisson arrival process, ≫ 1 for bursty feeds (a
  * scraper that dumps hourly batches, a bot that fires in spikes),
  * ≪ 1 for rate-limited/metronomic ones. Alongside q229's seasonal
  * decomposition and q256's CUSUM this is the single-scalar "is this
  * source's arrival process healthy" check (Cox & Lewis 1966, §4).
  *
  * The grid must be DENSE per group — silent hours are real zeros,
  * not missing rows — so the operator builds the global period grid
  * once and left-joins each group onto it with a 0 fill; skipping
  * this is the classic dispersion-audit bug (it biases D down,
  * exactly hiding the burstiness being hunted).
  *
  * Exactness: with n grid periods, Σc and Σc² exact BIGINTs,
  *
  *   fano = n·(n·Σc² − (Σc)²) / ((n−1) · n · Σc)  —  var/mean
  *
  * one closing double division, 6-dp. Scale shape: one (group,
  * period) count aggregate (map-side combined), one periods-grid
  * build, one groups×periods dense join (broadcast — the grid is
  * calendar-bounded), one final aggregate onto the groups grid. */
object Dispersion {

  /** (group, periods, total, mean, fano) per group; `periodCol` must
    * be an integral period index (epoch-hour, epoch-day). */
  def fano(df: DataFrame, groupCol: String, periodCol: String): DataFrame = {
    // ONE corpus pass: the (group, period) census pins (grid-sized);
    // the grid/groups/dense branches read the pin instead of
    // re-scanning (plan check: 3 scans, no ReusedExchange, before);
    // the groups-bounded result re-emits driver-side so the pin
    // releases before returning
    val spark = df.sparkSession
    Pinned.withCheckpoint(
      df.filter(col(periodCol).isNotNull)
        .select(col(groupCol).as("__g"),
          col(periodCol).cast("long").as("__p"))
        .groupBy(col("__g"), col("__p"))
        .agg(count(lit(1)).as("__c"))
    ) { counts =>
    val grid = counts.select(col("__p")).distinct()
    val groups = counts.select(col("__g")).distinct()
    val dense = groups.crossJoin(broadcast(grid))
      .join(counts, Seq("__g", "__p"), "left")
      .na.fill(0L, Seq("__c"))
    val out = dense.groupBy(col("__g"))
      .agg(count(lit(1)).as("periods"), sum(col("__c")).as("total"),
        // cast BEFORE the multiply (the Extremes.gumbelBlockMaxima rule):
        // long*long overflows ANSI at period counts above ~3.04e9
        sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__scc"))
      .filter(col("periods") >= 2 && col("total") > 0)
      .select(col("__g").as(groupCol), col("periods"), col("total"),
        round(col("total").cast("double") / col("periods").cast("double"),
          6).as("mean"),
        round((col("periods").cast("double") * col("__scc").cast("double") -
          col("total").cast("double") * col("total").cast("double")) /
          ((col("periods") - 1).cast("double") * col("total").cast("double")),
          6).as("fano"))
      .orderBy(col(groupCol))
    Grids.collectBounded(out, "dispersion group grid")
    }
  }

  /** Zero-inflation audit — the Poisson-baseline complement to
    * [[fano]]: a feed can have an unremarkable variance yet FAR more
    * silent periods than its own rate explains (a scraper that is
    * either fully on or fully off). Against the Poisson null at the
    * group's observed rate λ, P(zero) = e^{−λ}; the excess
    * p0_obs − e^{−λ} is the standard zero-inflation screen (Lambert
    * 1992's ZIP motivation) and > 0 by more than noise means the
    * arrival process is a mixture with an OFF state.
    *
    * Same dense-grid contract as [[fano]] (silent periods are real
    * zeros). Exactness: zeros/periods/total are exact BIGINTs; λ,
    * e^{−λ} and the excess close in doubles, 6-dp. */
  def zeroInflation(df: DataFrame, groupCol: String,
                    periodCol: String): DataFrame = {
    // same one-pass pinned-census shape as [[fano]]
    val spark = df.sparkSession
    Pinned.withCheckpoint(
      df.filter(col(periodCol).isNotNull)
        .select(col(groupCol).as("__g"),
          col(periodCol).cast("long").as("__p"))
        .groupBy(col("__g"), col("__p"))
        .agg(count(lit(1)).as("__c"))
    ) { counts =>
    val grid = counts.select(col("__p")).distinct()
    val groups = counts.select(col("__g")).distinct()
    val dense = groups.crossJoin(broadcast(grid))
      .join(counts, Seq("__g", "__p"), "left")
      .na.fill(0L, Seq("__c"))
    val out = dense.groupBy(col("__g"))
      .agg(count(lit(1)).as("periods"), sum(col("__c")).as("total"),
        sum(when(col("__c") === 0, 1L).otherwise(0L)).as("zeros"))
      .filter(col("periods") >= 1 && col("total") > 0)
      .select(col("__g").as(groupCol), col("periods"), col("total"),
        col("zeros"),
        round(col("total").cast("double") / col("periods").cast("double"),
          6).as("lambda"),
        round(col("zeros").cast("double") / col("periods").cast("double"),
          6).as("p0_obs"),
        round(exp(-(col("total").cast("double") /
          col("periods").cast("double"))), 6).as("p0_poisson"),
        round(col("zeros").cast("double") / col("periods").cast("double") -
          exp(-(col("total").cast("double") /
            col("periods").cast("double"))), 6).as("excess_zeros"))
      .orderBy(col(groupCol))
    Grids.collectBounded(out, "zero-inflation group grid")
    }
  }

  /** Negative-binomial moments fit over a count column — the MODEL
    * step after [[fano]]'s diagnosis: Fano > 1 says "overdispersed vs
    * Poisson"; the NB(r, p) moments fit says by HOW MUCH structure —
    * r̂ = m²/(s²−m) is the clumping parameter (small r = heavy user
    * heterogeneity, r → ∞ recovers Poisson), and the fitted p̂ = m/s²
    * feeds the standard count-model machinery (Gamma-mixed Poisson).
    * Underdispersion (s² ≤ m) refuses — an NB fit there would return
    * a negative r and poison anything downstream.
    *
    * Exactness: n, Σx and Σx² are exact (DECIMAL(38,0) for the
    * squares); m, the (n−1)-denominator s², r̂, p̂ and the dispersion
    * index close in one fixed double tree. One row:
    * (n, mean, variance, dispersion, r_hat, p_hat).
    *
    * Scale shape: ONE map-side-combined corpus pass. */
  def negBinFit(df: DataFrame, countCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType}
    val dt = df.schema(countCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"negBinFit: '$countCol' is $dt — counts are integers")
    val u = df.filter(col(countCol).isNotNull && col(countCol) >= 0)
      .select(col(countCol).cast("long").as("__x"))
    val r = u.agg(count(lit(1)).as("n"), sum(col("__x")).as("s"),
      sum(col("__x").cast("decimal(38,0)") * col("__x")).as("q")).head()
    val n = r.getLong(0)
    require(n >= 3, s"negBinFit needs >= 3 rows, got $n")
    val s = r.getLong(1)
    val q = BigDecimal(r.getDecimal(2)).toDouble
    val m = s.toDouble / n.toDouble
    val v = (q - s.toDouble * s.toDouble / n.toDouble) / (n - 1).toDouble
    require(v > m,
      f"negBinFit: variance $v%.4f <= mean $m%.4f — not overdispersed; " +
        "an NB fit is undefined (use Poisson)")
    val rHat = m * m / (v - m)
    val pHat = m / v
    val spark = df.sparkSession
    spark.range(1).select(lit(n).as("n"), round(lit(m), 6).as("mean"),
      round(lit(v), 6).as("variance"),
      round(lit(v / m), 6).as("dispersion"),
      round(lit(rHat), 6).as("r_hat"), round(lit(pHat), 6).as("p_hat"))
  }
  /** Gries' DP word dispersion (Gries 2008) — WORD-level burstiness,
    * the corpus-linguistics complement to the user-level [[fano]]:
    * for each word, how unevenly its occurrences spread across corpus
    * parts (sources), normalized for part size:
    *
    *   DP(w) = ½ · Σ_parts | v_p/f  −  s_p |
    *
    * with v_p the word's count in part p, f its corpus frequency, and
    * s_p the part's token share. DP ≈ 0 = the word follows the corpus
    * (function words); DP → 1 = the word lives in one part
    * (boilerplate/template markers, the dedup-adjacent flag). Reported
    * for the top `k` most-frequent words — the band where dispersion
    * is statistically meaningful and a reader actually looks.
    *
    * Exactness: all censuses are exact BIGINTs; each |v/f − s| term is
    * one double off exact longs and the per-word fold over parts
    * cumulates as DECIMAL(38,12) (order-independent). Scale shape: one
    * tokenize + one (part, word) census; the DP fold runs on
    * (top-k words × parts) rows. */
  def griesDp(df: DataFrame, partCol: String, textCol: String,
              k: Int = 20): DataFrame = {
    require(k >= 1 && k <= 500, s"griesDp: k=$k outside [1, 500]")
    val toks = df.filter(col(textCol).isNotNull && col(partCol).isNotNull)
      .select(col(partCol).cast("string").as("__p"), explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("__w"))
    val cells = toks.groupBy(col("__p"), col("__w"))
      .agg(count(lit(1)).as("__v"))
    val parts = cells.groupBy(col("__p")).agg(sum(col("__v")).as("__pt"))
    val nTot = parts.agg(coalesce(sum(col("__pt")), lit(0L))).head().getLong(0)
    require(nTot >= 2, s"griesDp: corpus has $nTot tokens")
    val top = cells.groupBy(col("__w")).agg(sum(col("__v")).as("__f"))
      .orderBy(col("__f").desc, col("__w")).limit(k)
    // full (top word × part) grid, zero-filled — absence from a part
    // contributes |0 − s_p|, which a sparse join would silently drop
    val grid = parts.crossJoin(broadcast(top))
      .join(cells, Seq("__p", "__w"), "left")
      .withColumn("__term", abs(
        coalesce(col("__v"), lit(0L)).cast("double") /
          col("__f").cast("double") -
        col("__pt").cast("double") / lit(nTot.toDouble))
        .cast("decimal(38,12)"))
    grid.groupBy(col("__w"), col("__f"))
      .agg((sum(col("__term")).cast("double") / 2.0).as("__dp"))
      .select(col("__w").as("word"), col("__f").as("freq"),
        round(col("__dp"), 6).as("dp"))
      .orderBy(col("dp").desc, col("word"))
  }
}
