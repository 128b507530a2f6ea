package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{Attribution, Hits, KAnonymity, RankTests, Rfm,
  Smoothing}

/** Round-16 growth/robust-stats extensions (q316–q322): multi-touch
  * attribution, HITS hubs/authorities, Mann–Whitney U and
  * Kruskal–Wallis H on the exact value-census machinery, RFM quintile
  * segmentation, the l-diversity release audit, and Holt linear-trend
  * smoothing. House hash-parity rules throughout (identical aliases,
  * exact accumulation or pinned fold order, total ORDER BY, doubles
  * only at the closing step). */
object GrowthQueries extends QuerySet {

  /** Multi-touch attribution over the event stream: purchases convert;
    * the other event types are the touch channels. */
  private def q316(s: SparkSession, d: String): DataFrame =
    Attribution.credit(t(s, d, "events"), "user_id", "ts", "event_id",
      "event_type", "purchase")

  private val q316Sql =
    """WITH ev AS (
      |  SELECT user_id AS u, ts, event_id AS eid, event_type AS ch,
      |    (event_type = 'purchase') AS conv
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL),
      |asg AS (
      |  SELECT *, first_value(CASE WHEN conv THEN eid END IGNORE NULLS)
      |    OVER (PARTITION BY u ORDER BY ts, eid
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS cid
      |  FROM ev),
      |touches AS (SELECT * FROM asg WHERE NOT conv AND cid IS NOT NULL),
      |convs AS (SELECT COUNT(*) AS n_conv FROM asg WHERE conv),
      |tot AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n FROM touches
      |  GROUP BY cid),
      |ranked AS (
      |  SELECT cid, ch,
      |    row_number() OVER (PARTITION BY cid ORDER BY ts, eid) AS rf,
      |    row_number() OVER (PARTITION BY cid ORDER BY ts DESC, eid DESC)
      |      AS rl
      |  FROM touches),
      |firsts AS (SELECT ch, CAST(COUNT(*) AS BIGINT) AS f FROM ranked
      |  WHERE rf = 1 GROUP BY ch),
      |lasts AS (SELECT ch, CAST(COUNT(*) AS BIGINT) AS l FROM ranked
      |  WHERE rl = 1 GROUP BY ch),
      |cells AS (
      |  SELECT tc.ch, tc.cnt, tot.n,
      |    CAST(COUNT(*) AS BIGINT) AS k
      |  FROM (SELECT cid, ch, CAST(COUNT(*) AS BIGINT) AS cnt
      |        FROM touches GROUP BY cid, ch) tc
      |  JOIN tot ON tc.cid = tot.cid
      |  GROUP BY tc.ch, tc.cnt, tot.n),
      |perch AS (
      |  SELECT ch,
      |    CAST(SUM(k * cnt) AS BIGINT) AS touches,
      |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(CAST(k AS DOUBLE) * CAST(cnt AS DOUBLE)
      |        / CAST(n AS DOUBLE) ORDER BY cnt, n)),
      |      (a, b) -> a + b), 6) AS linear
      |  FROM cells GROUP BY ch),
      |att AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_att FROM tot)
      |SELECT perch.ch AS channel,
      |  COALESCE(firsts.f, 0) AS first_touch,
      |  COALESCE(lasts.l, 0) AS last_touch,
      |  perch.linear, perch.touches,
      |  CAST(convs.n_conv AS BIGINT) AS n_conversions,
      |  att.n_att AS n_attributed,
      |  CAST(convs.n_conv AS BIGINT) - att.n_att AS n_unattributed
      |FROM perch
      |LEFT JOIN firsts ON perch.ch = firsts.ch
      |LEFT JOIN lasts ON perch.ch = lasts.ch
      |CROSS JOIN convs CROSS JOIN att
      |ORDER BY channel""".stripMargin

  /** HITS over the directed supplier→part supply graph (the q155 node
    * encoding keeps the two id spaces disjoint): hubs = suppliers that
    * stock broadly useful parts, authorities = parts stocked by strong
    * suppliers. 3 exact integer iterations, top 30 deterministically. */
  private def q317(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(
      col("l_suppkey").cast("long").as("l_suppkey"),
      col("l_partkey").cast("long").as("l_partkey"))
    val edges = li.select((col("l_suppkey") * 2).as("src"),
      (col("l_partkey") * 2 + 1).as("dst"))
    Hits.run(edges, "src", "dst", iterations = 3)
      .select(
        when(pmod(col("node"), lit(2)) === 0, lit("supplier"))
          .otherwise(lit("part")).as("kind"),
        expr("node div 2").as("entity_id"), col("hub"), col("auth"))
      .orderBy(col("auth").desc, col("hub").desc, col("kind"),
        col("entity_id"))
      .limit(30)
  }

  private val q317Sql = {
    val edges =
      "SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst " +
        "FROM lineitem"
    s"""WITH ${Hits.oracleCtes(edges, iterations = 3)}
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END
       |    AS kind,
       |  node // 2 AS entity_id, hub, auth
       |FROM hits_out
       |ORDER BY auth DESC, hub DESC, kind, entity_id
       |LIMIT 30""".stripMargin
  }

  /** Mann–Whitney U: did purchases shift the value distribution against
    * clicks (cents-scaled — the robust two-sample readout). */
  private def q318(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .filter(col("event_type").isin("purchase", "click") &&
        col("value").isNotNull)
      .select(when(col("event_type") === "purchase", 1).otherwise(0)
          .cast("int").as("g"),
        round(col("value") * 100).cast("long").as("v"))
    RankTests.mannWhitney(ev, "g", "v")
  }

  private val q318Sql =
    """WITH r AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
      |grid AS (
      |  SELECT v,
      |    CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |  FROM r GROUP BY v),
      |tr AS (
      |  SELECT v, n1, n2,
      |    CAST(SUM(n2) OVER w - n2 AS BIGINT) AS cb2,
      |    n1 + n2 AS tt
      |  FROM grid
      |  WINDOW w AS (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |p AS (
      |  SELECT CAST(SUM(n1) AS BIGINT) AS n1s,
      |    CAST(SUM(n2) AS BIGINT) AS n2s,
      |    CAST(SUM(2 * n1 * cb2 + n1 * n2) AS BIGINT) AS u1x2,
      |    CAST(SUM(tt * tt * tt - tt) AS BIGINT) AS ties
      |  FROM tr)
      |SELECT n1s AS n1, n2s AS n2,
      |  CAST(u1x2 AS DOUBLE) / 2.0 AS u1,
      |  CAST(n1s AS DOUBLE) * CAST(n2s AS DOUBLE)
      |    - CAST(u1x2 AS DOUBLE) / 2.0 AS u2,
      |  round((CAST(u1x2 AS DOUBLE) / 2.0
      |      - CAST(n1s AS DOUBLE) * CAST(n2s AS DOUBLE) / 2.0)
      |    / sqrt(CAST(n1s AS DOUBLE) * CAST(n2s AS DOUBLE) / 12.0
      |      * ((CAST(n1s + n2s AS DOUBLE) + 1.0)
      |        - CAST(ties AS DOUBLE) / (CAST(n1s + n2s AS DOUBLE)
      |          * (CAST(n1s + n2s AS DOUBLE) - 1.0)))), 6) AS z
      |FROM p""".stripMargin

  /** Kruskal–Wallis H: does ANY event type shift the value
    * distribution — the omnibus before pairwise tests. */
  private def q319(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
    RankTests.kruskalWallis(ev, "event_type", "v")
  }

  private val q319Sql =
    """WITH r AS (
      |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
      |cells AS (
      |  SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM r GROUP BY g, v),
      |vgrid AS (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM cells
      |  GROUP BY v),
      |ranked AS (
      |  SELECT v, t,
      |    2 * (CAST(SUM(t) OVER w AS BIGINT) - t) + t + 1 AS m2
      |  FROM vgrid
      |  WINDOW w AS (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |perg AS (
      |  SELECT g, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(c * m2) AS BIGINT) AS r2
      |  FROM cells JOIN ranked USING (v) GROUP BY g),
      |pooled AS (
      |  SELECT CAST(SUM(t) AS BIGINT) AS nn,
      |    CAST(SUM(t * t * t - t) AS BIGINT) AS ties
      |  FROM vgrid),
      |sums AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / 4.0
      |        / CAST(n AS DOUBLE) ORDER BY g)),
      |      (a, b) -> a + b) AS s
      |  FROM perg),
      |h AS (
      |  SELECT 12.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
      |      * sums.s - 3.0 * (CAST(nn AS DOUBLE) + 1.0) AS h0,
      |    1.0 - CAST(ties AS DOUBLE)
      |      / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
      |        * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)) AS tc,
      |    sums.k AS k
      |  FROM pooled, sums)
      |SELECT perg.g AS event_type, perg.n,
      |  CAST(perg.r2 AS DOUBLE) / 2.0 AS rank_sum,
      |  round(h.h0, 6) AS h, round(h.h0 / h.tc, 6) AS h_corrected,
      |  h.k - 1 AS df
      |FROM perg, h ORDER BY event_type""".stripMargin

  /** RFM quintile segmentation of the order book at a pinned as-of. */
  private def q320(s: SparkSession, d: String): DataFrame =
    Rfm.segments(t(s, d, "orders"), "o_custkey", "o_orderdate",
      "o_totalprice", "2002-01-01")

  private val q320Sql =
    """WITH per AS (
      |  SELECT o_custkey AS cust,
      |    CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
      |      DATE '2002-01-01') AS BIGINT) AS rec,
      |    CAST(COUNT(*) AS BIGINT) AS freq,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |      AS DECIMAL(38,2)) AS mon
      |  FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      |    AND o_totalprice IS NOT NULL
      |  GROUP BY o_custkey),
      |sc AS (
      |  SELECT *,
      |    ntile(5) OVER (ORDER BY rec DESC, cust) AS r_score,
      |    ntile(5) OVER (ORDER BY freq, cust) AS f_score,
      |    ntile(5) OVER (ORDER BY mon, cust) AS m_score
      |  FROM per)
      |SELECT r_score, f_score, m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champions'
      |    WHEN f_score >= 4 THEN 'loyal'
      |    WHEN r_score >= 4 THEN 'recent'
      |    WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      |    ELSE 'hibernating' END AS segment,
      |  CAST(COUNT(*) AS BIGINT) AS customers,
      |  CAST(CAST(CAST(SUM(mon) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
      |    AS monetary_total
      |FROM sc GROUP BY r_score, f_score, m_score
      |ORDER BY r_score, f_score, m_score""".stripMargin

  /** l-diversity release audit: QI = (lang, length band), sensitive =
    * source — cells where the pseudo-anonymous documents come from
    * fewer than 8 distinct sources concentrate provenance. */
  private def q321(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("lang"),
        floor(col("n_chars") / 100).cast("long").as("len_band"),
        col("source"))
    KAnonymity.lDiversity(docs, Seq("lang", "len_band"), "source", l = 8)
  }

  private val q321Sql =
    """WITH census AS (
      |  SELECT lang,
      |    CAST(floor(n_chars / 100) AS BIGINT) AS len_band,
      |    source, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2, 3),
      |cells AS (
      |  SELECT lang, len_band, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS l_distinct,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(-(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))
      |        ORDER BY source)),
      |      (a, b) -> a + b) AS hn
      |  FROM census GROUP BY lang, len_band)
      |SELECT lang, len_band, n, l_distinct,
      |  round(exp(ln(CAST(n AS DOUBLE)) + hn / CAST(n AS DOUBLE)), 6)
      |    AS entropy_l,
      |  CAST(8 AS BIGINT) AS l_required
      |FROM cells WHERE l_distinct < 8
      |ORDER BY lang, len_band""".stripMargin

  /** Holt linear-trend smoothing of the hourly value series (the
    * trending series [[Smoothing.ses]] lags by construction). */
  private def q322(s: SparkSession, d: String): DataFrame = {
    val grid = t(s, d, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(floor(unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg((sum(round(col("value") * 100).cast("long")).cast("double") /
        lit(100.0)).as("y"))
    Smoothing.holt(grid, "t", "y", alpha = 0.3, beta = 0.2)
  }

  private val q322Sql =
    """WITH RECURSIVE g AS (
      |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600
      |      AS t,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |      AS y
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      |  GROUP BY 1),
      |gi AS (SELECT t, y, row_number() OVER (ORDER BY t) AS rn FROM g),
      |rec AS (
      |  SELECT rn, t, y, y AS l,
      |    (SELECT y FROM gi WHERE rn = 2) - y AS b,
      |    CAST(NULL AS DOUBLE) AS e
      |  FROM gi WHERE rn = 1
      |  UNION ALL
      |  SELECT gi.rn, gi.t, gi.y,
      |    0.3 * gi.y + (1.0 - 0.3) * (rec.l + rec.b),
      |    0.2 * ((0.3 * gi.y + (1.0 - 0.3) * (rec.l + rec.b)) - rec.l)
      |      + (1.0 - 0.2) * rec.b,
      |    gi.y - (rec.l + rec.b)
      |  FROM rec JOIN gi ON gi.rn = rec.rn + 1)
      |SELECT t, y, round(l, 6) AS level, round(b, 6) AS trend,
      |  round(e, 6) AS forecast_err
      |FROM rec ORDER BY t""".stripMargin

  /** Rolling-origin seasonal-naive backtest with MASE over the hourly
    * cents grid — last 5 days test, daily season. */
  private def q323(s: SparkSession, d: String): DataFrame = {
    val grid = t(s, d, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(floor(unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
    graft.operators.Backtest.seasonalNaive(grid, "t", "y", season = 24,
      testLen = 120)
  }

  private val q323Sql =
    """WITH g AS (
      |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600
      |      AS t,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      |  GROUP BY 1),
      |lagged AS (
      |  SELECT t, y, row_number() OVER (ORDER BY t) AS rn,
      |    lag(y, 1) OVER (ORDER BY t) AS prev,
      |    lag(y, 24) OVER (ORDER BY t) AS seas
      |  FROM g),
      |cut AS (SELECT CAST(COUNT(*) AS BIGINT) - 120 AS c FROM lagged),
      |p AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN rn <= cut.c AND prev IS NOT NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
      |    CAST(SUM(CASE WHEN rn > cut.c AND seas IS NOT NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
      |    CAST(SUM(CASE WHEN rn > cut.c AND seas IS NOT NULL
      |      THEN abs(y - seas) ELSE 0 END) AS BIGINT) AS sae_model,
      |    CAST(SUM(CASE WHEN rn <= cut.c AND prev IS NOT NULL
      |      THEN abs(y - prev) ELSE 0 END) AS BIGINT) AS sae_naive
      |  FROM lagged, cut GROUP BY cut.c)
      |SELECT n_train, n_test, sae_model, sae_naive,
      |  round(CAST(sae_model AS DOUBLE) / n_test, 6) AS mae_model,
      |  round(CAST(sae_naive AS DOUBLE) / n_train, 6) AS mae_naive,
      |  round((CAST(sae_model AS DOUBLE) / n_test)
      |    / (CAST(sae_naive AS DOUBLE) / n_train), 6) AS mase
      |FROM p""".stripMargin

  /** Cochran's Q over THREE paired lang-id heuristics on the same
    * documents — the k-way omnibus before pairwise McNemar (q303). */
  private def q324(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .withColumn("__truth", col("lang") === "en")
      .withColumn("a_len", (col("n_chars") > 400) === col("__truth"))
      .withColumn("b_vowel",
        (regexp_count(lower(col("text")), lit("[aeiou]")) * 3 >
          length(col("text"))) === col("__truth"))
      .withColumn("c_the",
        col("text").contains(" the ") === col("__truth"))
    graft.operators.Experiments.cochranQ(docs,
      Seq("a_len", "b_vowel", "c_the"))
  }

  private val q324Sql =
    """WITH p AS (
      |  SELECT (n_chars > 400) = (lang = 'en') AS a_len,
      |    (len(regexp_extract_all(lower(text), '[aeiou]')) * 3
      |      > length(text)) = (lang = 'en') AS b_vowel,
      |    (contains(text, ' the ')) = (lang = 'en') AS c_the
      |  FROM documents WHERE text IS NOT NULL),
      |cc AS (SELECT * FROM p WHERE a_len IS NOT NULL
      |  AND b_vowel IS NOT NULL AND c_the IS NOT NULL),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN a_len THEN 1 ELSE 0 END) AS BIGINT) AS ga,
      |    CAST(SUM(CASE WHEN b_vowel THEN 1 ELSE 0 END) AS BIGINT) AS gb,
      |    CAST(SUM(CASE WHEN c_the THEN 1 ELSE 0 END) AS BIGINT) AS gc,
      |    CAST(SUM((CASE WHEN a_len THEN 1 ELSE 0 END)
      |      + (CASE WHEN b_vowel THEN 1 ELSE 0 END)
      |      + (CASE WHEN c_the THEN 1 ELSE 0 END)) AS BIGINT) AS sl,
      |    CAST(SUM(((CASE WHEN a_len THEN 1 ELSE 0 END)
      |      + (CASE WHEN b_vowel THEN 1 ELSE 0 END)
      |      + (CASE WHEN c_the THEN 1 ELSE 0 END))
      |      * ((CASE WHEN a_len THEN 1 ELSE 0 END)
      |      + (CASE WHEN b_vowel THEN 1 ELSE 0 END)
      |      + (CASE WHEN c_the THEN 1 ELSE 0 END))) AS BIGINT) AS sll
      |  FROM cc),
      |qv AS (
      |  SELECT n,
      |    round(CAST(2 * (3 * (CAST(ga AS HUGEINT) * ga
      |        + CAST(gb AS HUGEINT) * gb + CAST(gc AS HUGEINT) * gc)
      |      - CAST(ga + gb + gc AS HUGEINT) * (ga + gb + gc)) AS DOUBLE)
      |      / CAST(3 * sl - sll AS DOUBLE), 6) AS q,
      |    ga, gb, gc
      |  FROM agg)
      |SELECT cls.classifier, cls.successes, qv.n,
      |  CAST(3 AS BIGINT) AS k, qv.q, CAST(2 AS BIGINT) AS df
      |FROM qv CROSS JOIN (
      |  SELECT 'a_len' AS classifier, (SELECT ga FROM qv) AS successes
      |  UNION ALL SELECT 'b_vowel', (SELECT gb FROM qv)
      |  UNION ALL SELECT 'c_the', (SELECT gc FROM qv)) cls
      |ORDER BY cls.classifier""".stripMargin

  /** Hellinger distance between click and purchase value distributions
    * (dollar-quantized — the pre-quantization contract). */
  private def q325(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").filter(col("value").isNotNull)
      .select(col("event_type"), round(col("value")).cast("long").as("v"))
    graft.operators.Drift.hellinger(
      ev.filter(col("event_type") === "click").select(col("v")),
      ev.filter(col("event_type") === "purchase").select(col("v")), "v")
  }

  private val q325Sql =
    """WITH r AS (
      |  SELECT event_type, CAST(round(value) AS BIGINT) AS v
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
      |cells AS (
      |  SELECT v,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM r GROUP BY v),
      |p AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
      |    CAST(SUM(cb) AS BIGINT) AS nb,
      |    CAST(COUNT(*) AS BIGINT) AS grid,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(sqrt(CAST(ca * cb AS DOUBLE)) ORDER BY v)),
      |      (a, b) -> a + b) AS f
      |  FROM cells)
      |SELECT na AS n_a, nb AS n_b, grid,
      |  round(f / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
      |    AS bc,
      |  round(sqrt(greatest(0.0, 1.0
      |    - f / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))), 6)
      |    AS hellinger
      |FROM p""".stripMargin

  /** Decile shift function: WHERE in the cents distribution purchases
    * differ from clicks — all-integer order statistics, no floats. */
  private def q326(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").filter(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
    graft.operators.Shift.deciles(
      ev.filter(col("event_type") === "click").select(col("v")),
      ev.filter(col("event_type") === "purchase").select(col("v")), "v")
  }

  private val q326Sql =
    """WITH r AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
      |cells AS (
      |  SELECT v,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM r GROUP BY v),
      |cum AS (
      |  SELECT v, CAST(SUM(ca) OVER w AS BIGINT) AS cuma,
      |    CAST(SUM(cb) OVER w AS BIGINT) AS cumb
      |  FROM cells
      |  WINDOW w AS (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (SELECT MAX(cuma) AS na, MAX(cumb) AS nb FROM cum),
      |ks AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT)), (2), (3), (4),
      |  (5), (6), (7), (8), (9)) k(decile))
      |SELECT ks.decile,
      |  (SELECT MIN(v) FROM cum, tot WHERE cuma * 10 >= ks.decile * tot.na)
      |    AS q_ref,
      |  (SELECT MIN(v) FROM cum, tot WHERE cumb * 10 >= ks.decile * tot.nb)
      |    AS q_cur,
      |  (SELECT MIN(v) FROM cum, tot WHERE cumb * 10 >= ks.decile * tot.nb)
      |    - (SELECT MIN(v) FROM cum, tot
      |       WHERE cuma * 10 >= ks.decile * tot.na) AS shift
      |FROM ks ORDER BY ks.decile""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("q316_attribution", q316, Some(q316Sql)),
    Q("q317_hits", q317, Some(q317Sql)),
    Q("q318_mannwhitney", q318, Some(q318Sql)),
    Q("q319_kruskal", q319, Some(q319Sql)),
    Q("q320_rfm", q320, Some(q320Sql)),
    Q("q321_l_diversity", q321, Some(q321Sql)),
    Q("q322_holt", q322, Some(q322Sql)),
    Q("q323_mase_backtest", q323, Some(q323Sql)),
    Q("q324_cochran_q", q324, Some(q324Sql)),
    Q("q325_hellinger", q325, Some(q325Sql)),
    Q("q326_decile_shift", q326, Some(q326Sql)))
}
