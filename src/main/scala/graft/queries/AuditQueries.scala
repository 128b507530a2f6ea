package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.KAnonymity

/** Round-16 release/ingest audit extensions (q327+): t-closeness (the
  * ordered-attribute privacy audit k-anonymity and l-diversity miss),
  * functional-dependency and inclusion-dependency profiling, and the
  * changepoint/forecast closers. House hash-parity rules throughout. */
object AuditQueries extends QuerySet {

  /** t-closeness release audit: QI = (lang, source), sensitive =
    * n_chars decabands — ordered, so a 3-diverse cell can still
    * disclose length to ±one band; EMD against the global band
    * distribution catches it (q234 k-anonymity → q321 l-diversity →
    * this, the privacy-triad closer). */
  private def q327(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .filter(col("lang").isNotNull && col("source").isNotNull)
      .select(col("lang"), col("source"),
        floor(col("n_chars") / 10).cast("long").as("len_band"))
    KAnonymity.tCloseness(docs, Seq("lang", "source"), "len_band", t = 0.2)
  }

  private val q327Sql =
    """WITH census AS (
      |  SELECT lang, source, CAST(floor(n_chars / 10) AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents
      |  WHERE lang IS NOT NULL AND source IS NOT NULL
      |    AND n_chars IS NOT NULL
      |  GROUP BY 1, 2, 3),
      |grid AS (SELECT v, CAST(SUM(c) AS BIGINT) AS g FROM census
      |  GROUP BY v),
      |gcum AS (
      |  SELECT v, CAST(SUM(g) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cumg
      |  FROM grid),
      |gs AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
      |  CAST(SUM(g) AS BIGINT) AS nn FROM grid),
      |qcells AS (SELECT lang, source, CAST(SUM(c) AS BIGINT) AS n
      |  FROM census GROUP BY 1, 2),
      |cellcum AS (
      |  SELECT lang, source, v,
      |    CAST(SUM(c) OVER (PARTITION BY lang, source ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumc
      |  FROM census),
      |fullg AS (
      |  SELECT q.lang, q.source, q.n, g.v, g.cumg,
      |    COALESCE(MAX(cc.cumc) OVER (PARTITION BY q.lang, q.source
      |      ORDER BY g.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS ccf
      |  FROM qcells q CROSS JOIN gcum g
      |  LEFT JOIN cellcum cc
      |    ON cc.lang = q.lang AND cc.source = q.source AND cc.v = g.v),
      |emds AS (
      |  SELECT f.lang, f.source, f.n,
      |    SUM(abs(CAST(f.ccf AS HUGEINT) * gs.nn
      |      - CAST(f.cumg AS HUGEINT) * f.n)) AS num,
      |    MAX(gs.m) AS m, MAX(gs.nn) AS nn
      |  FROM fullg f, gs GROUP BY 1, 2, 3)
      |SELECT lang, source, n,
      |  round(CAST(CAST(num AS VARCHAR) AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(nn AS DOUBLE)
      |      * CAST(m - 1 AS DOUBLE)), 6) AS emd,
      |  round(CAST(CAST(num AS VARCHAR) AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(nn AS DOUBLE)
      |      * CAST(m - 1 AS DOUBLE)), 6) > 0.2 AS violates,
      |  0.2 AS t_required
      |FROM emds ORDER BY lang, source""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q327_t_closeness", q327, Some(q327Sql)))
}
