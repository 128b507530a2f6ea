package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{Causal, Keyness, Survival, VarianceRatio, VocabStats}

/** Round-17 inference extensions: the engine's first CAUSAL family
  * (difference-in-differences with the parallel-trends pre-check,
  * sharp regression discontinuity), the Lo–MacKinlay variance-ratio
  * random-walk test, Aalen–Johansen competing-risks incidence, Dunning
  * G² keyness, and frequency-spectrum lexical concentration. House
  * hash-parity rules throughout (exact decimal ledgers, fixed closing
  * double trees, round-6 outputs, total ORDER BY).
  */
object InferenceQueries extends QuerySet {

  /** Lo–MacKinlay variance ratios of hourly revenue at horizons
    * 2/4/8 — does revenue follow a random walk, and at which horizon
    * does structure live? The momentum/mean-reversion read q376's
    * single Hurst exponent cannot localize. */
  private def q401(s: SparkSession, d: String): DataFrame = {
    val grid = t(s, d, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
        .cast("long").as("t"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
    VarianceRatio.varianceRatio(grid, "t", "y", Seq(2, 4, 8))
  }

  private val q401Sql =
    """WITH g AS (
      |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS t,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      |  GROUP BY 1),
      |d1 AS (SELECT y - lag(y) OVER (ORDER BY t) AS dd FROM g),
      |s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(dd AS DECIMAL(38,0))) AS s,
      |    SUM(CAST(dd AS DECIMAL(38,0)) * dd) AS ss
      |  FROM d1 WHERE dd IS NOT NULL),
      |qs AS (SELECT CAST(unnest([2, 4, 8]) AS BIGINT) AS q),
      |dq AS (SELECT qs.q, g.y - lag(g.y, CAST(qs.q AS INT))
      |    OVER (PARTITION BY qs.q ORDER BY g.t) AS dd
      |  FROM g CROSS JOIN qs),
      |sq AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS nq,
      |    SUM(CAST(dd AS DECIMAL(38,0))) AS s,
      |    SUM(CAST(dd AS DECIMAL(38,0)) * dd) AS ss
      |  FROM dq WHERE dd IS NOT NULL GROUP BY q),
      |cl AS (SELECT sq.q, s1.n,
      |    (CAST(sq.ss AS DOUBLE) / sq.nq
      |      - (CAST(sq.s AS DOUBLE) / sq.nq) * (CAST(sq.s AS DOUBLE) / sq.nq))
      |    / (CAST(sq.q AS DOUBLE) *
      |       (CAST(s1.ss AS DOUBLE) / s1.n
      |        - (CAST(s1.s AS DOUBLE) / s1.n) * (CAST(s1.s AS DOUBLE) / s1.n)))
      |      AS vr,
      |    sqrt(2.0 * (2 * sq.q - 1) * (sq.q - 1)
      |      / (3.0 * sq.q * s1.n)) AS se
      |  FROM sq CROSS JOIN s1)
      |SELECT q, n, round(vr, 6) AS vr, round((vr - 1.0) / se, 6) AS z
      |FROM cl ORDER BY q""".stripMargin

  /** Difference-in-differences on purchase value: "treated" users
    * (odd user_id — the house synthetic-arm hash) vs control, before/
    * after mid-month. On randomized synthetic data the honest answer
    * is did ≈ 0 with parallel pre-slopes — the estimator's null
    * behaving; the gate's value is the full cell/slope accounting
    * replayed relationally. */
  private def q402(s: SparkSession, d: String): DataFrame = {
    val rows = t(s, d, "events")
      .filter(col("event_type") === "purchase" &&
        col("ts").isNotNull && col("value").isNotNull)
      .select(round(col("value") * 100).cast("long").as("cents"),
        dayofmonth(col("ts")).cast("long").as("tick"),
        (col("user_id") % 2 === 1).as("treated"),
        (dayofmonth(col("ts")) >= 16).as("post"))
    Causal.diffInDiff(rows, "cents", "tick", col("treated"), col("post"))
  }

  private val q402Sql = {
    // closing tree mirrors Causal.diffInDiff: decimal sums -> doubles
    val cell = "SELECT g, p, CAST(COUNT(*) AS BIGINT) AS n, " +
      "SUM(CAST(CAST(c AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS sy, " +
      "SUM(CAST(CAST(tick AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS st, " +
      "SUM(CAST(CAST(tick AS DECIMAL(18,6)) * CAST(tick AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS stt, " +
      "SUM(CAST(CAST(tick AS DECIMAL(18,6)) * CAST(c AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS sty " +
      "FROM r GROUP BY g, p"
    def m(g: String, p: String) =
      s"(SELECT CAST(sy AS DOUBLE) / n FROM cells WHERE g = $g AND p = $p)"
    def nn(g: String, p: String) =
      s"(SELECT n FROM cells WHERE g = $g AND p = $p)"
    def sl(g: String) =
      s"""(SELECT (CAST(sty AS DOUBLE) * n - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
         |  / (CAST(stt AS DOUBLE) * n - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
         |  FROM cells WHERE g = $g AND p = FALSE)""".stripMargin
    s"""WITH r AS (
       |  SELECT CAST(round(value * 100) AS BIGINT) AS c,
       |    CAST(day(ts) AS BIGINT) AS tick,
       |    user_id % 2 = 1 AS g, day(ts) >= 16 AS p
       |  FROM events WHERE event_type = 'purchase'
       |    AND ts IS NOT NULL AND value IS NOT NULL),
       |cells AS ($cell)
       |SELECT ${nn("TRUE", "FALSE")} AS n_t_pre, ${nn("TRUE", "TRUE")} AS n_t_post,
       |  ${nn("FALSE", "FALSE")} AS n_c_pre, ${nn("FALSE", "TRUE")} AS n_c_post,
       |  floor(${m("TRUE", "FALSE")} * 10000.0) / 10000.0 AS mean_t_pre,
       |  floor(${m("TRUE", "TRUE")} * 10000.0) / 10000.0 AS mean_t_post,
       |  floor(${m("FALSE", "FALSE")} * 10000.0) / 10000.0 AS mean_c_pre,
       |  floor(${m("FALSE", "TRUE")} * 10000.0) / 10000.0 AS mean_c_post,
       |  floor(((${m("TRUE", "TRUE")} - ${m("TRUE", "FALSE")})
       |    - (${m("FALSE", "TRUE")} - ${m("FALSE", "FALSE")})) * 10000.0)
       |    / 10000.0 AS did,
       |  floor(${sl("TRUE")} * 10000.0) / 10000.0 AS pre_slope_t,
       |  floor(${sl("FALSE")} * 10000.0) / 10000.0 AS pre_slope_c,
       |  floor((${sl("TRUE")} - ${sl("FALSE")}) * 10000.0) / 10000.0
       |    AS pre_slope_gap""".stripMargin
  }

  /** Sharp RD at the zero-balance cutoff: does crossing into negative
    * account balance discontinuously shift total spend? Local linear
    * both sides, ±1000 bandwidth. The honest synthetic answer is a
    * null gap with near-zero R² — the estimator refusing to read the
    * trend as treatment is the point. */
  private def q403(s: SparkSession, d: String): DataFrame = {
    val spend = t(s, d, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val cust = t(s, d, "customer")
      .join(spend, col("c_custkey") === col("ck"), "left")
      .select(col("c_acctbal").as("bal"),
        coalesce(col("cents"), lit(0L)).as("spend"))
    Causal.regressionDiscontinuity(cust, "bal", "spend",
      cutoff = 0.0, bandwidth = 1000.0)
  }

  private val q403Sql =
    """WITH spend AS (
      |  SELECT o_custkey AS ck,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |cu AS (
      |  SELECT CAST(c_acctbal AS DECIMAL(18,6))
      |      - CAST(0.0 AS DECIMAL(18,6)) AS x,
      |    CAST(COALESCE(spend.cents, 0) AS DECIMAL(18,6)) AS y
      |  FROM customer LEFT JOIN spend ON c_custkey = spend.ck
      |  WHERE c_acctbal IS NOT NULL),
      |inb AS (SELECT x, y, x >= 0 AS side FROM cu WHERE abs(x) <= 1000),
      |sides AS (SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(x AS DECIMAL(38,12))) AS sx,
      |    SUM(CAST(y AS DECIMAL(38,12))) AS sy,
      |    -- operands widened to DECIMAL(19,6): DuckDB's 18-digit
      |    -- multiply stays on int64 and overflows on cent-scaled spend
      |    SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))
      |      AS DECIMAL(38,12))) AS sxx,
      |    SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
      |      AS DECIMAL(38,12))) AS sxy,
      |    SUM(CAST(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
      |      AS DECIMAL(38,12))) AS syy
      |  FROM inb GROUP BY side),
      |fit AS (SELECT side, n,
      |    (CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
      |    (CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS cxy,
      |    (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS cxx,
      |    (CAST(syy AS DOUBLE) * n - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS cyy
      |  FROM sides),
      |ab AS (SELECT side, n, b, (syd - b * sxd) / n AS a,
      |    CASE WHEN cyy = 0 THEN 0.0 ELSE cxy * cxy / (cxx * cyy) END AS r2
      |  FROM fit)
      |SELECT l.n AS n_left, r.n AS n_right,
      |  floor(l.a * 10000.0) / 10000.0 AS intercept_left,
      |  floor(r.a * 10000.0) / 10000.0 AS intercept_right,
      |  floor((r.a - l.a) * 10000.0) / 10000.0 AS gap,
      |  floor(l.b * 10000.0) / 10000.0 AS slope_left,
      |  floor(r.b * 10000.0) / 10000.0 AS slope_right,
      |  floor(l.r2 * 10000.0) / 10000.0 AS r2_left,
      |  floor(r.r2 * 10000.0) / 10000.0 AS r2_right
      |FROM (SELECT * FROM ab WHERE NOT side) l
      |CROSS JOIN (SELECT * FROM ab WHERE side) r""".stripMargin

  /** Aalen–Johansen cumulative incidence: per user, hours from first
    * event to first PURCHASE (cause 1) vs first ERROR (cause 2) —
    * whichever strikes first — censored at the last observed event.
    * The "which exit wins, when" read a naive per-cause KM overstates;
    * CIF₁+CIF₂+S ≡ 1 holds by construction here. */
  private def q404(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").filter(col("ts").isNotNull)
    val per = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("f"), max(col("ts")).as("l"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
        min(when(col("event_type") === "error", col("ts"))).as("te"))
    val durs = per.select(
      when(col("tp").isNotNull && (col("te").isNull || col("tp") <= col("te")),
        floor((unix_timestamp(col("tp")) - unix_timestamp(col("f"))) / 3600))
        .when(col("te").isNotNull,
          floor((unix_timestamp(col("te")) - unix_timestamp(col("f"))) / 3600))
        .otherwise(floor((unix_timestamp(col("l")) - unix_timestamp(col("f"))) / 3600))
        .cast("long").as("dur"),
      when(col("tp").isNotNull && (col("te").isNull || col("tp") <= col("te")), 1)
        .when(col("te").isNotNull, 2).otherwise(0).as("cause"))
    Survival.aalenJohansen(durs, "dur", "cause")
  }

  private val q404Sql =
    """WITH per AS (
      |  SELECT user_id, MIN(ts) AS f, MAX(ts) AS l,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
      |    MIN(CASE WHEN event_type = 'error' THEN ts END) AS te
      |  FROM events WHERE ts IS NOT NULL GROUP BY user_id),
      |durs AS (
      |  SELECT CASE
      |      WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
      |        THEN CAST(floor(CAST(epoch(tp) - epoch(f) AS DOUBLE) / 3600) AS BIGINT)
      |      WHEN te IS NOT NULL
      |        THEN CAST(floor(CAST(epoch(te) - epoch(f) AS DOUBLE) / 3600) AS BIGINT)
      |      ELSE CAST(floor(CAST(epoch(l) - epoch(f) AS DOUBLE) / 3600) AS BIGINT)
      |    END AS t,
      |    CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 1
      |         WHEN te IS NOT NULL THEN 2 ELSE 0 END AS k
      |  FROM per),
      |grid AS (
      |  SELECT t, CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
      |    CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
      |    CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM durs GROUP BY t),
      |tot AS (SELECT CAST(SUM(d1 + d2 + c) AS BIGINT) AS n FROM grid),
      |ar AS (
      |  SELECT t, d1, d2, c,
      |    tot.n - CAST(SUM(d1 + d2 + c) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      + d1 + d2 + c AS n_risk
      |  FROM grid CROSS JOIN tot),
      |evt AS (SELECT * FROM ar WHERE d1 + d2 > 0),
      |sm AS (
      |  SELECT e1.t, e1.n_risk, e1.d1, e1.d2,
      |    list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
      |      list(CAST(e2.n_risk - e2.d1 - e2.d2 AS DOUBLE)
      |        / CAST(e2.n_risk AS DOUBLE) ORDER BY e2.t) FILTER (e2.t IS NOT NULL)),
      |      (a, b) -> a * b) AS sminus
      |  FROM evt e1 LEFT JOIN evt e2 ON e2.t < e1.t
      |  GROUP BY e1.t, e1.n_risk, e1.d1, e1.d2),
      |terms AS (
      |  SELECT t, n_risk, d1, d2, sminus,
      |    CAST(sminus * CAST(d1 AS DOUBLE) / CAST(n_risk AS DOUBLE)
      |      AS DECIMAL(38,12)) AS t1,
      |    CAST(sminus * CAST(d2 AS DOUBLE) / CAST(n_risk AS DOUBLE)
      |      AS DECIMAL(38,12)) AS t2
      |  FROM sm)
      |SELECT t, n_risk, d1, d2,
      |  round(CAST(SUM(t1) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
      |    AS cif1,
      |  round(CAST(SUM(t2) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
      |    AS cif2,
      |  round(sminus * CAST(n_risk - d1 - d2 AS DOUBLE)
      |    / CAST(n_risk AS DOUBLE), 6) AS km_all
      |FROM terms ORDER BY t""".stripMargin

  /** Dunning G² keyness: the top-5 over-used words per source against
    * the rest of the corpus — the per-word provenance/templating read
    * PMI can't give at low counts. */
  private def q405(s: SparkSession, d: String): DataFrame =
    Keyness.keynessG2(t(s, d, "documents"), "source", "text",
      k = 5, minCount = 5L)

  private val q405Sql =
    """WITH toks AS (
      |  SELECT CAST(source AS VARCHAR) AS g,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
      |cells AS (SELECT g, w, CAST(COUNT(*) AS BIGINT) AS a
      |  FROM toks GROUP BY g, w),
      |wt AS (SELECT w, CAST(SUM(a) AS BIGINT) AS wt FROM cells GROUP BY w),
      |gt AS (SELECT g, CAST(SUM(a) AS BIGINT) AS gt FROM cells GROUP BY g),
      |nt AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM cells),
      |sc AS (
      |  SELECT cells.g, cells.w, cells.a,
      |    wt.wt - cells.a AS b, gt.gt - cells.a AS c,
      |    nt.n - wt.wt - (gt.gt - cells.a) AS dd,
      |    CAST(wt.wt AS DOUBLE) * CAST(gt.gt AS DOUBLE)
      |      / CAST(nt.n AS DOUBLE) AS ea,
      |    CAST(wt.wt AS DOUBLE) * (CAST(nt.n AS DOUBLE)
      |      - CAST(gt.gt AS DOUBLE)) / CAST(nt.n AS DOUBLE) AS eb,
      |    (CAST(nt.n AS DOUBLE) - CAST(wt.wt AS DOUBLE))
      |      * CAST(gt.gt AS DOUBLE) / CAST(nt.n AS DOUBLE) AS ec,
      |    (CAST(nt.n AS DOUBLE) - CAST(wt.wt AS DOUBLE))
      |      * (CAST(nt.n AS DOUBLE) - CAST(gt.gt AS DOUBLE))
      |      / CAST(nt.n AS DOUBLE) AS ed,
      |    CAST(nt.n AS DOUBLE) AS nd, CAST(gt.gt AS DOUBLE) AS gtd
      |  FROM cells JOIN wt USING (w) JOIN gt USING (g) CROSS JOIN nt
      |  WHERE cells.a >= 5),
      |g2 AS (
      |  SELECT g, w, a, b,
      |    2.0 * ((CASE WHEN a > 0 THEN CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE) / ea) ELSE 0.0 END
      |      + CASE WHEN b > 0 THEN CAST(b AS DOUBLE) * ln(CAST(b AS DOUBLE) / eb) ELSE 0.0 END)
      |      + CASE WHEN c > 0 THEN CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE) / ec) ELSE 0.0 END
      |      + CASE WHEN dd > 0 THEN CAST(dd AS DOUBLE) * ln(CAST(dd AS DOUBLE) / ed) ELSE 0.0 END) AS g2
      |  FROM sc
      |  WHERE CAST(a AS DOUBLE) * (nd - gtd) > CAST(b AS DOUBLE) * gtd),
      |rk AS (SELECT g, w, a, b, g2,
      |    row_number() OVER (PARTITION BY g ORDER BY g2 DESC, w) AS rank
      |  FROM g2)
      |SELECT g AS source, CAST(rank AS INT) AS rank, w AS word,
      |  a AS n_in, b AS n_rest, round(g2, 6) AS g2
      |FROM rk WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  /** Frequency-spectrum lexical concentration per source: Yule's K +
    * Simpson's D — the boilerplate/template flag two sources with
    * identical TTR (q285) can hide. */
  private def q407(s: SparkSession, d: String): DataFrame =
    VocabStats.concentration(t(s, d, "documents"), "source", "text")

  private val q407Sql =
    """WITH toks AS (
      |  SELECT source AS g,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents WHERE text IS NOT NULL),
      |tf AS (SELECT g, w, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM toks GROUP BY g, w),
      |agg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS types,
      |    CAST(SUM(f) AS BIGINT) AS tokens,
      |    CAST(SUM(f * f) AS BIGINT) AS sff,
      |    CAST(SUM(f * (f - 1)) AS BIGINT) AS sff1
      |  FROM tf GROUP BY g)
      |SELECT g AS source, types, tokens,
      |  round(10000.0 * CAST(sff - tokens AS DOUBLE)
      |    / (CAST(tokens AS DOUBLE) * CAST(tokens AS DOUBLE)), 6) AS yule_k,
      |  round(CAST(sff1 AS DOUBLE)
      |    / (CAST(tokens AS DOUBLE) * CAST(tokens - 1 AS DOUBLE)), 6)
      |    AS simpson_d
      |FROM agg WHERE tokens >= 2 ORDER BY source""".stripMargin

  override val queries: Seq[Q] = Seq(
    Q("q401_variance_ratio", q401, Some(q401Sql)),
    Q("q402_diff_in_diff", q402, Some(q402Sql)),
    Q("q403_regression_discontinuity", q403, Some(q403Sql)),
    Q("q404_competing_risks", q404, Some(q404Sql)),
    Q("q405_keyness_g2", q405, Some(q405Sql)),
    Q("q407_lexical_concentration", q407, Some(q407Sql)))
}
