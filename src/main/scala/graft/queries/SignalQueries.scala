package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{Association, Drift, Variance}

/** Round-17 signal/association extensions (q361+): the energy-distance
  * drift closer (the squared-CDF companion to q280's W₁), the
  * mean-difference omnibus (one-way ANOVA beside q319's rank form),
  * and the predictive-association family (Goodman–Kruskal λ beside
  * q174's χ²). House hash-parity rules throughout: exact integer /
  * DECIMAL(38,0) censuses, ordered IEEE folds at the close, every
  * computed column aliased identically in Spark and SQL. */
object SignalQueries extends QuerySet {

  /** Energy distance between open ('O') and fulfilled ('F') order
    * price distributions — the "did fulfillment select on price"
    * audit; q280's W₁ reports how far mass moved, this squares the
    * CDF gap so it is a consistent two-sample TEST statistic. */
  private def q361(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").filter(col("o_totalprice").isNotNull)
      .select(col("o_orderstatus").as("st"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    Drift.energyDistance(o.filter(col("st") === "O"),
      o.filter(col("st") === "F"), "cents")
  }

  private val q361Sql =
    """WITH cells AS (
      |  SELECT v, CAST(SUM(r) AS BIGINT) AS nr, CAST(SUM(c) AS BIGINT) AS nc
      |  FROM (
      |    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |      1 AS r, 0 AS c
      |    FROM orders WHERE o_totalprice IS NOT NULL
      |      AND o_orderstatus = 'O'
      |    UNION ALL
      |    SELECT CAST(round(o_totalprice * 100) AS BIGINT), 0, 1
      |    FROM orders WHERE o_totalprice IS NOT NULL
      |      AND o_orderstatus = 'F')
      |  GROUP BY v),
      |cum AS (
      |  SELECT v, nr, nc,
      |    CAST(SUM(nr) OVER (ORDER BY v) AS HUGEINT) AS cr,
      |    CAST(SUM(nc) OVER (ORDER BY v) AS HUGEINT) AS cc,
      |    SUM(CAST(v AS HUGEINT) * nr) OVER (ORDER BY v) AS sr,
      |    SUM(CAST(v AS HUGEINT) * nc) OVER (ORDER BY v) AS sc
      |  FROM cells),
      |tot AS (SELECT CAST(SUM(nr) AS BIGINT) AS tnr,
      |  CAST(SUM(nc) AS BIGINT) AS tnc,
      |  SUM(CAST(v AS HUGEINT) * nr) AS tsr,
      |  SUM(CAST(v AS HUGEINT) * nc) AS tsc FROM cells),
      |sums AS (
      |  SELECT
      |    SUM(CAST(nr AS HUGEINT) * (CAST(v AS HUGEINT)
      |      * (2 * cc - tot.tnc) - 2 * sc + tot.tsc)) AS sxy,
      |    SUM(CAST(nr AS HUGEINT) * (CAST(v AS HUGEINT)
      |      * (2 * cr - tot.tnr) - 2 * sr + tot.tsr)) AS sxx,
      |    SUM(CAST(nc AS HUGEINT) * (CAST(v AS HUGEINT)
      |      * (2 * cc - tot.tnc) - 2 * sc + tot.tsc)) AS syy
      |  FROM cum, tot),
      |es AS (
      |  SELECT tot.tnr, tot.tnc,
      |    CAST(sums.sxy AS DOUBLE)
      |      / (CAST(tot.tnr AS DOUBLE) * CAST(tot.tnc AS DOUBLE)) AS ec,
      |    CAST(sums.sxx AS DOUBLE)
      |      / (CAST(tot.tnr AS DOUBLE) * CAST(tot.tnr AS DOUBLE)) AS er,
      |    CAST(sums.syy AS DOUBLE)
      |      / (CAST(tot.tnc AS DOUBLE) * CAST(tot.tnc AS DOUBLE)) AS eu
      |  FROM sums, tot)
      |SELECT tnr AS n_ref, tnc AS n_cur,
      |  round(ec, 6) AS e_cross, round(er, 6) AS e_ref,
      |  round(eu, 6) AS e_cur,
      |  round(2.0 * ec - er - eu, 6) AS d2,
      |  round(CAST(tnr AS DOUBLE) * CAST(tnc AS DOUBLE)
      |    / (CAST(tnr AS DOUBLE) + CAST(tnc AS DOUBLE))
      |    * (2.0 * ec - er - eu), 6) AS t_stat
      |FROM es""".stripMargin

  /** One-way ANOVA of order price (cents) across the five order
    * priorities — "do the priority tiers differ in MEAN spend, in
    * cents" (q319 asks the rank question; this one is in the
    * metric's own units, with η² keeping the effect honest). */
  private def q362(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .filter(col("o_orderpriority").isNotNull &&
        col("o_totalprice").isNotNull)
      .select(col("o_orderpriority").as("g"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    Variance.anovaOneWay(o, "g", "cents")
  }

  private val q362Sql =
    """WITH u AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS x
      |  FROM orders
      |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      |cells AS (
      |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS s,
      |    SUM(CAST(x AS HUGEINT) * x) AS q
      |  FROM u GROUP BY g),
      |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |  CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss,
      |  CAST(SUM(q) AS DOUBLE) AS qq FROM cells),
      |aa AS (
      |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |        / CAST(n AS DOUBLE) ORDER BY g)),
      |    (a, b) -> a + b) AS a
      |  FROM cells),
      |cl AS (
      |  SELECT kk.k, kk.nn,
      |    aa.a - CAST(kk.ss AS DOUBLE) * CAST(kk.ss AS DOUBLE)
      |      / CAST(kk.nn AS DOUBLE) AS ssb,
      |    kk.qq - aa.a AS ssw,
      |    kk.qq - CAST(kk.ss AS DOUBLE) * CAST(kk.ss AS DOUBLE)
      |      / CAST(kk.nn AS DOUBLE) AS sst
      |  FROM kk, aa)
      |SELECT k, nn AS n, k - 1 AS df1, nn - k AS df2,
      |  round((ssb / CAST(k - 1 AS DOUBLE))
      |    / (ssw / CAST(nn - k AS DOUBLE)), 6) AS f_stat,
      |  round(ssb / sst, 6) AS eta_sq
      |FROM cl""".stripMargin

  /** Goodman–Kruskal λ of event type given hour-of-day — "does knowing
    * the hour improve the best guess of what users DO": the
    * predictive-value read a significant q174-style χ² can't give
    * (association without mode movement reads λ = 0 here). */
  private def q363(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_type").as("a"), hour(col("ts")).cast("long").as("b"))
    Association.gkLambda(e, "a", "b")
  }

  private val q363Sql =
    """WITH cells AS (
      |  SELECT event_type AS a, CAST(hour(ts) AS BIGINT) AS b,
      |    CAST(COUNT(*) AS BIGINT) AS nab
      |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY 1, 2),
      |mb AS (SELECT CAST(SUM(m) AS BIGINT) AS smb
      |  FROM (SELECT b, MAX(nab) AS m FROM cells GROUP BY b)),
      |ma AS (SELECT CAST(SUM(m) AS BIGINT) AS sma
      |  FROM (SELECT a, MAX(nab) AS m FROM cells GROUP BY a)),
      |ra AS (SELECT CAST(MAX(na) AS BIGINT) AS mra,
      |  CAST(SUM(na) AS BIGINT) AS n
      |  FROM (SELECT a, SUM(nab) AS na FROM cells GROUP BY a)),
      |rb AS (SELECT CAST(MAX(nb) AS BIGINT) AS mrb
      |  FROM (SELECT b, SUM(nab) AS nb FROM cells GROUP BY b)),
      |cc AS (SELECT CAST(COUNT(*) AS BIGINT) AS cells FROM cells)
      |SELECT ra.n, cc.cells, mb.smb AS sum_colmax, ma.sma AS sum_rowmax,
      |  ra.mra AS modal_row, rb.mrb AS modal_col,
      |  round(CAST(mb.smb - ra.mra AS DOUBLE)
      |    / CAST(ra.n - ra.mra AS DOUBLE), 6) AS lambda_a_given_b,
      |  round(CAST(ma.sma - rb.mrb AS DOUBLE)
      |    / CAST(ra.n - rb.mrb AS DOUBLE), 6) AS lambda_b_given_a,
      |  round(CAST(mb.smb + ma.sma - ra.mra - rb.mrb AS DOUBLE)
      |    / CAST(2 * ra.n - ra.mra - rb.mrb AS DOUBLE), 6) AS lambda_sym
      |FROM mb, ma, ra, rb, cc""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q361_energy_distance", q361, Some(q361Sql)),
    Q("q362_anova_f", q362, Some(q362Sql)),
    Q("q363_gk_lambda", q363, Some(q363Sql)))
}
