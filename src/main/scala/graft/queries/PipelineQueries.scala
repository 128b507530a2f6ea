package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{Cohorts, Conformal, Drift, Experiments, Funnel,
  Markov, Readability, Smoothing, TextProfile, VocabStats}

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

  /** Cochran–Mantel–Haenszel common-association test: arm = house hash
    * of the customer, outcome = premium order, strata = market
    * segments — [[Experiments.cmh]] with the stratum-ordered fold. */
  private def q286(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "orders").join(t(s, d, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        graft.operators.Splits.hashBucket(col("o_custkey"), 2).as("arm"),
        (col("o_totalprice") > 250000.0).as("y"))
    Experiments.cmh(df, "segment", "arm", "y")
  }

  private val q286Sql =
    """WITH d AS (
      |  SELECT c.c_mktsegment AS segment,
      |    CAST(((o.o_custkey % 2147483648) * 2654435761) % 4294967296 % 2
      |      AS INTEGER) AS arm,
      |    (o.o_totalprice > 250000.0) AS y
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |cells AS (
      |  SELECT segment AS stratum,
      |    CAST(SUM(CASE WHEN arm = 1 AND y THEN 1 ELSE 0 END) AS BIGINT)
      |      AS a,
      |    CAST(SUM(CASE WHEN arm = 1 AND NOT y THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b,
      |    CAST(SUM(CASE WHEN arm <> 1 AND y THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c,
      |    CAST(SUM(CASE WHEN arm <> 1 AND NOT y THEN 1 ELSE 0 END)
      |      AS BIGINT) AS d
      |  FROM d GROUP BY segment),
      |t AS (
      |  SELECT stratum, a + b + c + d AS n, a, b, c, d,
      |    CAST(a AS DOUBLE) - CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
      |      / CAST(a + b + c + d AS DOUBLE) AS dev,
      |    CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
      |      * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
      |      / (CAST(a + b + c + d AS DOUBLE) * CAST(a + b + c + d AS DOUBLE)
      |         * CAST(a + b + c + d - 1 AS DOUBLE)) AS var,
      |    CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
      |      / CAST(a + b + c + d AS DOUBLE) AS ad,
      |    CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
      |      / CAST(a + b + c + d AS DOUBLE) AS bc
      |  FROM cells WHERE a + b + c + d >= 2),
      |p AS (
      |  SELECT
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(dev ORDER BY stratum)), (x, z) -> x + z) AS sdev,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(var ORDER BY stratum)), (x, z) -> x + z) AS svar,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(ad ORDER BY stratum)), (x, z) -> x + z) AS sad,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(bc ORDER BY stratum)), (x, z) -> x + z) AS sbc
      |  FROM t)
      |SELECT t.stratum, t.n, t.a, t.b, t.c, t.d,
      |  CASE WHEN t.b * t.c > 0 THEN
      |    round(CAST(t.a AS DOUBLE) * CAST(t.d AS DOUBLE)
      |      / (CAST(t.b AS DOUBLE) * CAST(t.c AS DOUBLE)), 6) END
      |    AS or_stratum,
      |  round(p.sdev * p.sdev / p.svar, 6) AS cmh_chi2,
      |  CASE WHEN p.sbc > 0 THEN round(p.sad / p.sbc, 6) END AS or_mh
      |FROM t, p ORDER BY t.stratum""".stripMargin

  /** Simple exponential smoothing of the hourly event-volume grid —
    * [[Smoothing.ses]] with the pinned 12-dp weight table (α = 0.3);
    * the oracle replays the identical weight literals. */
  private def q287(s: SparkSession, d: String): DataFrame = {
    val grid = t(s, d, "events").filter(col("ts").isNotNull)
      .groupBy(floor(unix_timestamp(col("ts")) / 3600L).as("t"))
      .agg(count(lit(1)).cast("double").as("y"))
    Smoothing.ses(grid, "t", "y", alpha = 0.3)
  }

  private val q287Sql = {
    val nz = Smoothing.weights(0.3, 4096).takeWhile(_ != 0.0)
    val lits = nz.map(w => new java.math.BigDecimal(w)
      .setScale(12, java.math.RoundingMode.HALF_UP).toPlainString)
      .mkString("[", ", ", "]")
    s"""WITH g AS (
       |  SELECT epoch_us(ts) // 3600000000 AS t,
       |    CAST(COUNT(*) AS DOUBLE) AS y
       |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
       |idx AS (SELECT t, y, row_number() OVER (ORDER BY t) AS rn FROM g),
       |wl AS (SELECT $lits AS w),
       |terms AS (
       |  SELECT a.t, a.y, a.rn, b.rn AS i,
       |    (CASE WHEN b.rn = 1 THEN
       |       (CASE WHEN a.rn <= ${nz.length} THEN wl.w[a.rn]
       |        ELSE 0.0 END)
       |     ELSE 0.3 * (CASE WHEN a.rn - b.rn + 1 <= ${nz.length}
       |       THEN wl.w[a.rn - b.rn + 1] ELSE 0.0 END) END) AS wt,
       |    b.y AS yi
       |  FROM idx a JOIN idx b ON b.rn <= a.rn, wl),
       |lv AS (
       |  SELECT t, y, rn,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(wt * yi ORDER BY i)), (x, z) -> x + z) AS level
       |  FROM terms WHERE wt <> 0.0 GROUP BY t, y, rn)
       |SELECT t, y, round(level, 6) AS level,
       |  round(y - lag(level) OVER (ORDER BY rn), 6) AS forecast_err
       |FROM lv ORDER BY t""".stripMargin
  }

  /** First-order Markov transition matrix over user event sequences —
    * [[Markov.transitions]] with the (ts, event_id) total order. */
  private def q288(s: SparkSession, d: String): DataFrame =
    Markov.transitions(t(s, d, "events"), "user_id", "event_type",
      "ts", "event_id")

  private val q288Sql =
    """WITH seq AS (
      |  SELECT user_id, event_type AS prev_state,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_state
      |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
      |c AS (
      |  SELECT prev_state, next_state, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM seq WHERE next_state IS NOT NULL
      |  GROUP BY prev_state, next_state),
      |rt AS (SELECT prev_state, CAST(SUM(n) AS BIGINT) AS row_total
      |  FROM c GROUP BY prev_state)
      |SELECT c.prev_state, c.next_state, c.n, rt.row_total,
      |  round(CAST(c.n AS DOUBLE) / CAST(rt.row_total AS DOUBLE), 6) AS p
      |FROM c JOIN rt ON c.prev_state = rt.prev_state
      |ORDER BY c.prev_state, c.next_state""".stripMargin

  /** Split-conformal 90% interval calibration of a one-feature OLS on
    * lineitem — [[Conformal.olsCoverage]]: hash splits, exact decimal
    * sufficient statistics, micro-unit residual order statistic. */
  private def q289(s: SparkSession, d: String): DataFrame =
    Conformal.olsCoverage(
      t(s, d, "lineitem")
        .withColumn("li_id", col("l_orderkey") * 8 + col("l_linenumber")),
      "li_id", "l_quantity", "l_extendedprice", epsilon = 0.1)

  private val q289Sql =
    """WITH u AS (
      |  SELECT CAST(CAST((l_orderkey * 8 + l_linenumber) % 2147483648
      |      AS HUGEINT) * 2654435761 % 4294967296 % 4 AS INTEGER) AS b,
      |    CAST(l_quantity AS DECIMAL(19,6)) AS x,
      |    CAST(l_extendedprice AS DECIMAL(19,6)) AS y
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      |s AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(CAST(CAST(SUM(x) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)
      |      AS sx,
      |    CAST(CAST(CAST(SUM(y) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)
      |      AS sy,
      |    CAST(CAST(CAST(SUM(x*x) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)
      |      AS sxx,
      |    CAST(CAST(CAST(SUM(x*y) AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE)
      |      AS sxy
      |  FROM u WHERE b <= 1),
      |fit AS (
      |  SELECT n AS n_train,
      |    (sxy * n - sx * sy) / (sxx * n - sx * sx) AS slope, sx, sy, n
      |  FROM s),
      |fit2 AS (
      |  SELECT n_train, slope,
      |    (sy - slope * sx) / n AS intercept
      |  FROM fit),
      |cal AS (
      |  SELECT CAST(floor(abs(CAST(CAST(u.y AS VARCHAR) AS DOUBLE)
      |      - (fit2.intercept + fit2.slope
      |         * CAST(CAST(u.x AS VARCHAR) AS DOUBLE))) * 1e6) AS BIGINT)
      |    AS r
      |  FROM u, fit2 WHERE u.b = 2),
      |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
      |kk AS (SELECT LEAST(n_cal,
      |    CAST(ceil((n_cal + 1) * 0.9) AS BIGINT)) AS k, n_cal FROM nc),
      |q AS (
      |  SELECT r AS qhat_u, kk.n_cal FROM
      |    (SELECT r, row_number() OVER (ORDER BY r) AS rn FROM cal) s, kk
      |  WHERE s.rn = kk.k),
      |tst AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
      |    CAST(SUM(CASE WHEN
      |      CAST(floor(abs(CAST(CAST(u.y AS VARCHAR) AS DOUBLE)
      |        - (fit2.intercept + fit2.slope
      |           * CAST(CAST(u.x AS VARCHAR) AS DOUBLE))) * 1e6) AS BIGINT)
      |      <= q.qhat_u THEN 1 ELSE 0 END) AS BIGINT) AS covered
      |  FROM u, fit2, q WHERE u.b = 3)
      |SELECT fit2.n_train, q.n_cal, tst.n_test,
      |  round(fit2.slope, 6) AS slope,
      |  round(fit2.intercept, 6) AS intercept,
      |  round(CAST(q.qhat_u AS DOUBLE) / 1e6, 6) AS qhat,
      |  tst.covered,
      |  round(CAST(tst.covered AS DOUBLE) / CAST(tst.n_test AS DOUBLE), 6)
      |    AS coverage,
      |  0.9 AS target
      |FROM fit2, q, tst""".stripMargin

  /** Streaming CUSUM level-shift monitor under the driver gate —
    * [[graft.streaming.CusumMonitor]] (q256 made continuous): odd
    * events arrive as six deterministic micro-batches, batches 4-5
    * carry a +20 level shift, and CUSUM must alert on BOTH (the
    * accumulation a per-batch threshold cannot see) while batches 0-3
    * stay quiet against target 50, k = 5, h = 12. */
  private def q290(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.Files
    val ev = t(s, d, "events").filter(col("event_id") % 2 === 1)
      .select(col("event_id"),
        when(col("event_id") % 12 >= 9, col("value") + 20.0)
          .otherwise(col("value")).as("v"))
    val srcDir = Files.createTempDirectory("graft-q290-src").toFile
    val base = System.currentTimeMillis()
    Seq(1, 3, 5, 7, 9, 11).zipWithIndex.foreach { case (r, i) =>
      val tmp = Files.createTempDirectory("graft-q290-stage").toFile
      ev.filter(col("event_id") % 12 === r).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      tmp.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val dst = new java.io.File(srcDir, s"batch$i.parquet")
        java.nio.file.Files.move(f.toPath, dst.toPath)
        dst.setLastModified(base + i * 1000L)
      }
    }
    val store = new graft.store.DocumentStore(s,
      Files.createTempDirectory("graft-q290-store").toString)
    val feed = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val qy = graft.streaming.CusumMonitor.start(feed, store, "cledger",
      "cverdict", "v",
      Files.createTempDirectory("graft-q290-ckpt").toString,
      target = 50.0, k = 5.0, h = 12.0)
    try qy.processAllAvailable() finally qy.stop()
    store.read("cverdict")
      .select(col("batch_id"), col("n_batch"), col("mean_batch"),
        col("cusum_pos"), col("cusum_neg"), col("alert"))
      .orderBy(col("batch_id"))
  }

  private val q290Sql =
    """WITH str AS (
      |  SELECT (event_id % 12) // 2 AS b,
      |    CASE WHEN event_id % 12 >= 9 THEN value + 20.0 ELSE value END
      |      AS v
      |  FROM events WHERE event_id % 2 = 1),
      |led AS (
      |  SELECT b AS batch_id, CAST(COUNT(v) AS BIGINT) AS n_batch,
      |    round(CAST(CAST(CAST(SUM(CAST(v AS DECIMAL(18,6)))
      |        AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) / COUNT(v), 6)
      |      AS mean_batch
      |  FROM str WHERE v IS NOT NULL GROUP BY b),
      |dev AS (
      |  SELECT batch_id, n_batch, mean_batch,
      |    CAST(mean_batch AS DECIMAL(18,6)) - CAST(50.0 AS DECIMAL(18,6))
      |      - CAST(5.0 AS DECIMAL(18,6)) AS dp,
      |    CAST(50.0 AS DECIMAL(18,6)) - CAST(mean_batch AS DECIMAL(18,6))
      |      - CAST(5.0 AS DECIMAL(18,6)) AS dn
      |  FROM led WHERE n_batch > 0),
      |cs AS (
      |  SELECT batch_id, n_batch, mean_batch,
      |    CAST(SUM(dp) OVER w AS DECIMAL(38,6)) AS cp,
      |    CAST(SUM(dn) OVER w AS DECIMAL(38,6)) AS cn
      |  FROM dev WINDOW w AS (ORDER BY batch_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |mn AS (
      |  SELECT batch_id, n_batch, mean_batch, cp, cn,
      |    MIN(cp) OVER w AS mp, MIN(cn) OVER w AS mq
      |  FROM cs WINDOW w AS (ORDER BY batch_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |-- DuckDB LEAST(decimal, decimal) demotes to DOUBLE; CASE keeps
      |-- the exact decimal domain
      |ss AS (
      |  SELECT batch_id, n_batch, mean_batch,
      |    cp - (CASE WHEN mp < 0 THEN mp
      |          ELSE CAST(0 AS DECIMAL(38,6)) END) AS sp,
      |    cn - (CASE WHEN mq < 0 THEN mq
      |          ELSE CAST(0 AS DECIMAL(38,6)) END) AS sn
      |  FROM mn)
      |SELECT batch_id, n_batch, mean_batch,
      |  CAST(CAST(sp AS VARCHAR) AS DOUBLE) AS cusum_pos,
      |  CAST(CAST(sn AS VARCHAR) AS DOUBLE) AS cusum_neg,
      |  (sp > CAST(12.0 AS DECIMAL(38,6))
      |    OR sn > CAST(12.0 AS DECIMAL(38,6))) AS alert
      |FROM ss ORDER BY batch_id""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q280_wasserstein_drift", q280, Some(q280Sql)),
    Q("q281_readability", q281, Some(q281Sql)),
    Q("q282_funnel_conversion", q282, Some(q282Sql)),
    Q("q283_cohort_retention", q283, Some(q283Sql)),
    Q("q284_script_mix", q284, Some(q284Sql)),
    Q("q285_lexical_diversity", q285, Some(q285Sql)),
    Q("q286_cmh_test", q286, Some(q286Sql)),
    Q("q287_ses_forecast", q287, Some(q287Sql)),
    Q("q288_markov_transitions", q288, Some(q288Sql)),
    Q("q289_conformal_coverage", q289, Some(q289Sql)),
    Q("q290_streaming_cusum", q290, Some(q290Sql)))
}
