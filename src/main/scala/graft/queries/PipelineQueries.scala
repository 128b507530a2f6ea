package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{Cohorts, Drift, Funnel, Readability, TextProfile,
  VocabStats}

/** Round-15 pipeline-audit extensions (q280+): exact 1-Wasserstein
  * drift, corpus readability, funnel conversion, cohort retention,
  * script-mix hygiene, lexical diversity, and the round's remaining
  * experiment/model additions. House hash-parity rules throughout
  * (identical aliases, exact integer/decimal accumulation, doubles
  * only at the closing step, total ORDER BY). */
object PipelineQueries extends QuerySet {

  /** Exact earth-mover distance between the even/odd document-length
    * distributions (the q267 split made metric): [[Drift.wasserstein1]]
    * on the merged distinct-value grid — integer numerators, one
    * closing division. */
  private def q280(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    Drift.wasserstein1(docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "n_chars")
  }

  private val q280Sql =
    """WITH cells AS (
      |  SELECT v, CAST(SUM(r) AS BIGINT) AS nr, CAST(SUM(c) AS BIGINT) AS nc
      |  FROM (
      |    SELECT n_chars AS v, 1 AS r, 0 AS c FROM documents
      |    WHERE doc_id % 2 = 0
      |    UNION ALL
      |    SELECT n_chars, 0, 1 FROM documents WHERE doc_id % 2 = 1)
      |  GROUP BY v),
      |cum AS (
      |  SELECT v,
      |    CAST(SUM(nr) OVER (ORDER BY v) AS HUGEINT) AS cr,
      |    CAST(SUM(nc) OVER (ORDER BY v) AS HUGEINT) AS cc,
      |    CAST(COALESCE(LEAD(v) OVER (ORDER BY v) - v, 0) AS HUGEINT) AS gap
      |  FROM cells),
      |tot AS (SELECT CAST(SUM(nr) AS BIGINT) AS tnr,
      |  CAST(SUM(nc) AS BIGINT) AS tnc,
      |  MIN(v) AS lo, MAX(v) AS hi FROM cells),
      |num AS (SELECT SUM(abs(cr * tot.tnc - cc * tot.tnr) * gap) AS nm
      |  FROM cum, tot)
      |SELECT tot.tnr AS n_ref, tot.tnc AS n_cur, tot.lo, tot.hi,
      |  round(CAST(num.nm AS DOUBLE) /
      |    (CAST(tot.tnr AS DOUBLE) * CAST(tot.tnc AS DOUBLE)), 6) AS w1,
      |  CASE WHEN tot.hi > tot.lo THEN
      |    round(CAST(num.nm AS DOUBLE) /
      |      (CAST(tot.tnr AS DOUBLE) * CAST(tot.tnc AS DOUBLE)
      |        * CAST(tot.hi - tot.lo AS DOUBLE)), 6) END AS w1_norm
      |FROM tot, num""".stripMargin

  /** Corpus-level Flesch/FK readability per language —
    * [[Readability.fleschPerGroup]]: three integer regex counters
    * summed per group, formulas on the aggregate ratios. */
  private def q281(s: SparkSession, d: String): DataFrame =
    Readability.fleschPerGroup(t(s, d, "documents"), "lang", "text")

  private val q281Sql =
    """WITH per AS (
      |  SELECT lang,
      |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
      |      AS BIGINT) AS w,
      |    GREATEST(CAST(len(regexp_extract_all(lower(text), '[.!?]+'))
      |      AS BIGINT), 1) AS s,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS y
      |  FROM documents WHERE text IS NOT NULL),
      |g AS (
      |  SELECT lang, COUNT(*) AS n_docs, CAST(SUM(w) AS BIGINT) AS words,
      |    CAST(SUM(s) AS BIGINT) AS sentences,
      |    CAST(SUM(y) AS BIGINT) AS syllables
      |  FROM per GROUP BY lang)
      |SELECT lang, n_docs, words, sentences, syllables,
      |  round(206.835
      |    - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
      |    - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)), 6)
      |    AS flesch_ease,
      |  round(0.39 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
      |    + 11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
      |    - 15.59, 6) AS fk_grade
      |FROM g WHERE words > 0 ORDER BY lang""".stripMargin

  /** First-touch funnel view → click → purchase over the event stream
    * — [[Funnel.conversion]]: chained window minima on one user
    * partitioning. */
  private def q282(s: SparkSession, d: String): DataFrame =
    Funnel.conversion(t(s, d, "events"), "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))

  private val q282Sql =
    """WITH e AS (
      |  SELECT user_id AS u, event_type AS t, ts FROM events
      |  WHERE ts IS NOT NULL
      |    AND event_type IN ('view', 'click', 'purchase')),
      |s1 AS (SELECT u, MIN(ts) AS t1 FROM e WHERE t = 'view' GROUP BY u),
      |s2 AS (SELECT e.u, MIN(e.ts) AS t2 FROM e JOIN s1 ON e.u = s1.u
      |  WHERE e.t = 'click' AND e.ts > s1.t1 GROUP BY e.u),
      |s3 AS (SELECT e.u, MIN(e.ts) AS t3 FROM e JOIN s2 ON e.u = s2.u
      |  WHERE e.t = 'purchase' AND e.ts > s2.t2 GROUP BY e.u),
      |c AS (SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS u1,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS u2,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS u3)
      |SELECT 1 AS step_idx, 'view' AS step, u1 AS users,
      |  round(1.0, 6) AS rate_prev,
      |  CASE WHEN u1 > 0 THEN
      |    round(CAST(u1 AS DOUBLE) / CAST(u1 AS DOUBLE), 6) END
      |    AS rate_first
      |FROM c
      |UNION ALL
      |SELECT 2, 'click', u2,
      |  CASE WHEN u1 > 0 THEN
      |    round(CAST(u2 AS DOUBLE) / CAST(u1 AS DOUBLE), 6) END,
      |  CASE WHEN u1 > 0 THEN
      |    round(CAST(u2 AS DOUBLE) / CAST(u1 AS DOUBLE), 6) END
      |FROM c
      |UNION ALL
      |SELECT 3, 'purchase', u3,
      |  CASE WHEN u2 > 0 THEN
      |    round(CAST(u3 AS DOUBLE) / CAST(u2 AS DOUBLE), 6) END,
      |  CASE WHEN u1 > 0 THEN
      |    round(CAST(u3 AS DOUBLE) / CAST(u1 AS DOUBLE), 6) END
      |FROM c
      |ORDER BY step_idx""".stripMargin

  /** Weekly cohort retention matrix over the event stream —
    * [[Cohorts.retention]] from the 2024-01-01 origin. */
  private def q283(s: SparkSession, d: String): DataFrame =
    Cohorts.retention(t(s, d, "events"), "user_id", "ts", "2024-01-01")

  private val q283Sql =
    """WITH a AS (
      |  SELECT DISTINCT user_id AS u,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS w
      |  FROM events WHERE ts IS NOT NULL
      |    AND date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) >= 0),
      |cohort AS (SELECT u, MIN(w) AS c FROM a GROUP BY u),
      |sizes AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cohort_users
      |  FROM cohort GROUP BY c),
      |act AS (
      |  SELECT cohort.c, a.w - cohort.c AS week_offset,
      |    CAST(COUNT(*) AS BIGINT) AS active_users
      |  FROM a JOIN cohort ON a.u = cohort.u
      |  GROUP BY cohort.c, a.w - cohort.c)
      |SELECT act.c AS cohort_week, act.week_offset, sizes.cohort_users,
      |  act.active_users,
      |  round(CAST(act.active_users AS DOUBLE) /
      |    CAST(sizes.cohort_users AS DOUBLE), 6) AS retention
      |FROM act JOIN sizes ON act.c = sizes.c
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** Script-mix hygiene audit per language — [[TextProfile.scriptMix]]:
    * explicit-codepoint-range counters, BIGINT sums, closing ratios. */
  private def q284(s: SparkSession, d: String): DataFrame =
    TextProfile.scriptMix(t(s, d, "documents"), "lang", "text")

  private val q284Sql =
    """WITH g AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(length(text)) AS BIGINT) AS chars,
      |    CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]')))
      |      AS BIGINT) AS lat,
      |    CAST(SUM(len(regexp_extract_all(text, '[0-9]')))
      |      AS BIGINT) AS dig,
      |    CAST(SUM(len(regexp_extract_all(text, '[ \t\n\r]')))
      |      AS BIGINT) AS sp,
      |    CAST(SUM(len(regexp_extract_all(text, '[Ѐ-ӿ]')))
      |      AS BIGINT) AS cyr,
      |    CAST(SUM(len(regexp_extract_all(text, '[一-鿿]')))
      |      AS BIGINT) AS cjk
      |  FROM documents WHERE text IS NOT NULL GROUP BY lang)
      |SELECT lang, n_docs, chars,
      |  round(CAST(lat AS DOUBLE) / chars, 6) AS latin_ratio,
      |  round(CAST(dig AS DOUBLE) / chars, 6) AS digit_ratio,
      |  round(CAST(sp AS DOUBLE) / chars, 6) AS space_ratio,
      |  round(CAST(cyr AS DOUBLE) / chars, 6) AS cyrillic_ratio,
      |  round(CAST(cjk AS DOUBLE) / chars, 6) AS cjk_ratio,
      |  round(CAST(chars - lat - dig - sp - cyr - cjk AS DOUBLE) / chars, 6)
      |    AS other_ratio
      |FROM g WHERE chars > 0 ORDER BY lang""".stripMargin

  /** Lexical diversity per source — [[VocabStats.lexicalDiversity]]:
    * TTR, Guiraud root TTR, Herdan's C off one wordcount aggregate. */
  private def q285(s: SparkSession, d: String): DataFrame =
    VocabStats.lexicalDiversity(t(s, d, "documents"), "source", "text")

  private val q285Sql =
    """WITH toks AS (
      |  SELECT source,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |  FROM documents WHERE text IS NOT NULL),
      |tf AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM toks GROUP BY source, term),
      |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS types,
      |  CAST(SUM(f) AS BIGINT) AS tokens FROM tf GROUP BY source)
      |SELECT source, types, tokens,
      |  round(CAST(types AS DOUBLE) / CAST(tokens AS DOUBLE), 6) AS ttr,
      |  round(CAST(types AS DOUBLE) / sqrt(CAST(tokens AS DOUBLE)), 6)
      |    AS root_ttr,
      |  round(ln(CAST(types AS DOUBLE)) / ln(CAST(tokens AS DOUBLE)), 6)
      |    AS herdan_c
      |FROM g WHERE tokens > 1 ORDER BY source""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q280_wasserstein_drift", q280, Some(q280Sql)),
    Q("q281_readability", q281, Some(q281Sql)),
    Q("q282_funnel_conversion", q282, Some(q282Sql)),
    Q("q283_cohort_retention", q283, Some(q283Sql)),
    Q("q284_script_mix", q284, Some(q284Sql)),
    Q("q285_lexical_diversity", q285, Some(q285Sql)))
}
