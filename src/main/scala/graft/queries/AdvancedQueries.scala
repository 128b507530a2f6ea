package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{AsOfJoin, SaltedJoin}

/** Ordered-analytics operators beyond the reference's fixed surface:
  * as-of join, gap sessionization, exact quantiles, correlated-subquery
  * decorrelation. These are the time-series/training-pipeline shapes a
  * 100 TB engine needs; each has an exact DuckDB oracle.
  */
object AdvancedQueries extends QuerySet {

  // exact money accumulation: double -> decimal(18,2) -> sum -> double
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** As-of join: each purchase event picks up the latest prior (<=) view
    * event of the same user — single-shuffle union-sort plan, see
    * [[graft.operators.AsOfJoin]]. Oracle is DuckDB's native ASOF JOIN.
    * (ts is unique per user in TESTDATA, so the match is unambiguous.) */
  private def q23(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"),
        col("value").as("view_value"))
    AsOfJoin.leftAsOf(purchases, views, keys = Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        rightCols = Seq("view_event_id", "view_value"), prefix = "")
      .select(col("event_id"), col("user_id"), col("view_event_id"), col("view_value"))
      .orderBy(col("event_id"))
  }

  private val q23Sql =
    """SELECT p.event_id, p.user_id, v.event_id AS view_event_id, v.value AS view_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.event_id""".stripMargin

  /** Gap-based sessionization: a new session starts after >6h of user
    * inactivity. lag -> flag -> running sum -> per-session rollup; one
    * shuffle on user_id shared by both windows and the final groupBy. */
  private def q24(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 6L * 3600 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  private val q24Sql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR ts - LAG(ts) OVER w > INTERVAL 6 HOUR THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM g)
      |SELECT user_id, session_idx, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM sess GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  /** Exact linear-interpolated quantiles per group. Parity trick: quantile
    * positions are dyadic (k/4), and inputs are scaled to integer cents,
    * so the interpolation (1-f)*a + f*b is exact in double arithmetic in
    * both engines — no rounding needed. */
  private def q25(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("bigint")
    t(s, d, "lineitem")
      .withColumn("__cents", cents)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(__cents, 0.25)").as("p25_cents"),
        expr("percentile(__cents, 0.5)").as("p50_cents"),
        expr("percentile(__cents, 0.75)").as("p75_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val q25Sql =
    """SELECT l_returnflag,
      |  quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) AS p25_cents,
      |  quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS p50_cents,
      |  quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) AS p75_cents,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Correlated scalar subquery (TPC-H Q17 shape), decorrelated into an
    * aggregate + broadcast-join plan: lineitems cheaper than 20% of their
    * part's average quantity. Thresholds go through exact DECIMAL sums so
    * both engines compare against bit-identical doubles. */
  private def q26(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    // parenthesization must match the oracle exactly — 0.2 * (sum/count),
    // not (0.2*sum)/count — double arithmetic is not associative
    val thresholds = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg((lit(0.2) * (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
        count(lit(1)))).as("threshold"))
    li.join(broadcast(t(s, d, "part")).filter(col("p_brand") === "Brand#13"),
        col("l_partkey") === col("p_partkey"))
      .join(thresholds, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("threshold"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  private val q26Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#13'
      |  AND l_quantity < (
      |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  /** Skew-resistant salted join: results are identical to a plain join by
    * construction, so the oracle is the plain SQL join — the salting is a
    * physical-plan property (hot keys spread over `salts` reducers). */
  private def q27(s: SparkSession, d: String): DataFrame =
    SaltedJoin.inner(t(s, d, "lineitem"), t(s, d, "supplier")
        .withColumnRenamed("s_suppkey", "l_suppkey"), Seq("l_suppkey"), salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("s_nationkey"))

  private val q27Sql =
    """SELECT s_nationkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** Sketch aggregates for 100 TB profiling: HyperLogLog++ distinct
    * counts. The sketch estimate itself is engine-defined, so the
    * HASH-GREEN face is the exact distinct counts (DuckDB-replayable),
    * GATED in-query on the sketch: rows are emitted ONLY if every
    * group's HLL relative error vs the exact distinct is ≤ 5% — an
    * accuracy regression zeroes `spark_rows` AND the oracle hash, which
    * the driver sees. Exact distinct is affordable at gate scale; at
    * 100 TB only the sketch pass runs (the exact pass is the gate's
    * scaffolding, not the production plan). */
  private def q28(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    // rsd=0.01: measured worst-group error ≤0.9% at sf0.01/sf0.1 (the
    // default 0.05 sketch misses the 5% bound on l_orderkey) — 5× margin
    // under the gate, still a fixed-size sketch per group
    // group-cardinality rows, consumed by the bound check AND the emit:
    // cached so the sketch pass over lineitem runs once (same rationale
    // as the recall gate's cache)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_orders"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .cache()
    val offBound = approx.join(exact, "l_returnflag")
      .filter(
        abs(col("approx_parts") - col("exact_parts")) / col("exact_parts") > lit(0.05) ||
        abs(col("approx_orders") - col("exact_orders")) / col("exact_orders") > lit(0.05))
      .count()
    val out = exact.orderBy(col("l_returnflag"))
    if (offBound == 0L) out else out.limit(0)
  }

  private val q28Sql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  COUNT(DISTINCT l_orderkey) AS exact_orders
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Full outer join: customers without orders AND orphan order keys both
    * survive (completes the join-type inventory: inner/semi/anti/left
    * variants live in q05-q08). */
  private def q29(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_custkey"), col("c_name"))
      .join(t(s, d, "orders").filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)

  private val q29Sql =
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice
      |FROM customer FULL OUTER JOIN
      |  (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
      |  ON c_custkey = o_custkey
      |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin

  /** TPC-H Q3 shape (shipping priority): selective dim filter,
    * fact⋈fact⋈dim, grouped revenue, global top-10 — the canonical
    * "join then top-k" OLAP plan. */
  private def q52(s: SparkSession, d: String): DataFrame = {
    val cutoff = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    t(s, d, "lineitem").filter(col("l_shipdate") > lit(cutoff))
      .join(t(s, d, "orders").filter(col("o_orderdate") < lit(cutoff)),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      ).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q52Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Conditional aggregation (TPC-H Q12 shape): CASE buckets inside the
    * aggregate, one pass over the fact. */
  private def q53(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("high_priority"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("low_priority"))
      .orderBy(col("o_orderstatus"))

  private val q53Sql =
    """SELECT o_orderstatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_priority
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Funnel: purchases preceded by a view from the same user within 1h —
    * the bounded range self-join of product analytics. The time bound
    * caps the pair space (vs the unbounded as-of which q23 covers). */
  private def q54(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
    p.join(v, Seq("user_id"))
      .filter(col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("p_id")).distinct()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("converted_purchases"))
      .orderBy(col("user_id"))
  }

  private val q54Sql =
    """SELECT user_id, COUNT(*) AS converted_purchases FROM (
      |  SELECT DISTINCT p.user_id, p.event_id
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |    ON p.user_id = v.user_id
      |   AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** CUBE grouping sets (complements q21's ROLLUP). */
  private def q55(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val q55Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Statistical moments — correlation and sample stddev — computed from
    * EXACT decimal power sums so both engines derive identical doubles
    * (the built-in corr/stddev stream partial doubles whose accumulation
    * order differs per engine/partitioning). */
  private def q56(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(28,4)")
    val y = col("l_extendedprice").cast("decimal(28,4)")
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"), sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 9).as("corr_qty_price"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6)
          .as("stddev_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val q56Sql =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS corr_qty_price,
      |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** Pattern predicates (LIKE prefix/infix, regexp) — absent from the
    * reference's pure-equality surface (SURVEY §2.2), first-class here. */
  private def q57(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .filter(col("p_name").like("%gold%") ||
        (col("p_brand").like("Brand#1%") && col("p_type").rlike("^ECONOMY")))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
      .orderBy(col("p_partkey"))

  private val q57Sql =
    """SELECT p_partkey, p_name, p_brand, p_type FROM part
      |WHERE p_name LIKE '%gold%'
      |   OR (p_brand LIKE 'Brand#1%' AND regexp_matches(p_type, '^ECONOMY'))
      |ORDER BY p_partkey""".stripMargin

  /** Full ordered-analytics window surface: lead/lag, first/last value
    * with explicit frames, ntile, percent_rank, cume_dist — one shuffle
    * on user_id shared by every window (same partitioning + ordering). */
  private def q58(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "events")
      .filter(col("user_id") < 30)
      .select(col("event_id"), col("user_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("value")).over(run).as("first_v"),
        last(col("value")).over(full).as("last_v"),
        ntile(4).over(w).as("tile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("event_id"))
  }

  private val q58Sql =
    """SELECT event_id, user_id,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value,
      |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
      |  last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
      |  ntile(4) OVER w AS tile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM events WHERE user_id < 30
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** Explicit GROUPING SETS (beyond q21 rollup / q55 cube) with
    * grouping() markers, via the SQL surface. */
  private def q59(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer").createOrReplaceTempView("customer")
    s.sql(q59Sql)
  }

  private val q59Sql =
    """SELECT c_mktsegment, c_nationkey,
      |  CAST(grouping(c_mktsegment) AS INTEGER) AS g_seg,
      |  CAST(grouping(c_nationkey) AS INTEGER) AS g_nat,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer
      |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment),
      |  (c_nationkey), ())
      |ORDER BY g_seg, g_nat, c_mktsegment ASC NULLS FIRST,
      |  c_nationkey ASC NULLS FIRST""".stripMargin

  /** Calendar/date function surface (absent from the reference — its only
    * timestamp is Message.TimeStamp): truncation, field extraction,
    * day-of-week normalization, date arithmetic with month clamping. */
  private def q63(s: SparkSession, d: String): DataFrame = {
    val od = col("o_orderdate").cast("date")
    t(s, d, "orders")
      .filter(col("o_orderkey") <= 3000)
      .select(col("o_orderkey"),
        od.as("od"),
        trunc(od, "month").as("month_start"),
        year(od).as("yr"), quarter(od).as("qtr"), month(od).as("mo"),
        dayofmonth(od).as("dom"),
        (dayofweek(od) - 1).as("dow"), // normalize: 0 = Sunday, both engines
        datediff(od, lit(java.sql.Date.valueOf("2020-01-01"))).as("days_since"),
        last_day(od).as("month_end"),
        add_months(od, 2).as("plus2m"))
      .orderBy(col("o_orderkey"))
  }

  private val q63Sql =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS od,
      |  date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
      |  year(CAST(o_orderdate AS DATE)) AS yr,
      |  quarter(CAST(o_orderdate AS DATE)) AS qtr,
      |  month(CAST(o_orderdate AS DATE)) AS mo,
      |  dayofmonth(CAST(o_orderdate AS DATE)) AS dom,
      |  dayofweek(CAST(o_orderdate AS DATE)) AS dow,
      |  date_diff('day', DATE '2020-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
      |FROM orders WHERE o_orderkey <= 3000
      |ORDER BY o_orderkey""".stripMargin

  /** Wide-to-long reshape: conditional aggregation into per-priority
    * columns, then unpivot (melt) back to rows — the Dataset.unpivot
    * operator; oracle is the relational UNION ALL equivalent. */
  private def q68(s: SparkSession, d: String): DataFrame = {
    def bucket(p: String) =
      dsum(when(col("o_orderpriority") === p, col("o_totalprice")))
    t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(bucket("1-URGENT").as("urgent"), bucket("2-HIGH").as("high"),
        bucket("3-MEDIUM").as("medium"))
      .unpivot(Array(col("o_orderstatus")),
        Array(col("urgent"), col("high"), col("medium")),
        "priority_class", "total")
      .orderBy(col("o_orderstatus"), col("priority_class"))
  }

  private val q68Sql =
    """WITH wide AS (
      |  SELECT o_orderstatus,
      |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent,
      |    CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS high,
      |    CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
      |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS medium
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT * FROM (
      |  SELECT o_orderstatus, 'urgent' AS priority_class, urgent AS total FROM wide
      |  UNION ALL
      |  SELECT o_orderstatus, 'high', high FROM wide
      |  UNION ALL
      |  SELECT o_orderstatus, 'medium', medium FROM wide)
      |ORDER BY o_orderstatus, priority_class""".stripMargin

  /** Time-based RANGE window frame: per-user trailing-1-hour event count
    * and value sum at every event. The frame is expressed over epoch
    * micros (numeric range), which both engines evaluate identically —
    * and the shape is the streaming-analytics staple (rolling features
    * for training data). */
  private def q71(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    t(s, d, "events")
      .filter(col("user_id") < 40)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("sum_1h"))
      .orderBy(col("event_id"))
  }

  private val q71Sql =
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
      |FROM events WHERE user_id < 40
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match each other — the MERGE-key semantics a plain equi-join cannot
    * express. */
  private def q72(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
      .select(nullif(col("c_nationkey") % 5, lit(0)).as("k"))
    val sup = t(s, d, "supplier")
      .select(nullif(col("s_nationkey") % 5, lit(0)).as("k2"))
    c.join(sup, col("k") <=> col("k2"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k").asc_nulls_first)
  }

  private val q72Sql =
    """SELECT k, COUNT(*) AS n
      |FROM (SELECT nullif(c_nationkey % 5, 0) AS k FROM customer) c
      |JOIN (SELECT nullif(s_nationkey % 5, 0) AS k2 FROM supplier) s
      |  ON k IS NOT DISTINCT FROM k2
      |GROUP BY k ORDER BY k ASC NULLS FIRST""".stripMargin

  /** Approximate percentiles (GK/QuantileSummaries sketch): the one-pass
    * mergeable scale path beside exact q25 (which needs a per-group sort
    * of the full column). Sketches merge associatively, so the shuffle
    * carries one ~accuracy-sized summary per partition per group — not
    * the data. The sketch estimate is engine-defined, so the hash-green
    * face is the exact per-group ORDER STATISTICS (element selection —
    * replayable bit-for-bit) and the accuracy promise is gated IN-QUERY
    * (q28 pattern): the GK
    * guarantee is rank error ≤ n/accuracy, so each approx value must lie
    * between the exact interpolated percentiles at q ∓ δ, where
    * δ = 1/accuracy + 2/min(group n). The 2/n term converts ranks to
    * interpolated fractions: percentile_approx returns a REAL element at
    * rank within εn of the target, and the element at rank k equals the
    * interpolated percentile at (k−1)/(n−1), which q ∓ (ε + 2/n)
    * brackets for any n ≥ 2. Any value outside its bracket zeroes the
    * output, which the driver sees as a row-count regression. Exact
    * brackets are cheap at gate scale; at 100 TB a user runs the sketch
    * alone — the gate is the test harness, not the operator. */
  private def q73(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val accuracy = 10000
    val minN = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .agg(min(col("n"))).head().getLong(0)
    val eps = 1.0 / accuracy + 2.0 / minN
    val qs = Seq(0.5, 0.95, 0.99)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        array(qs.map(lit): _*), lit(accuracy)).as("approx_p"))
      .cache()
    val brackets = li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"),
          array(qs.map(q => lit(math.max(0.0, q - eps))): _*)).as("lo"),
        percentile(col("l_extendedprice"),
          array(qs.map(q => lit(math.min(1.0, q + eps))): _*)).as("hi"))
    val offBound = approx.join(brackets, "l_returnflag")
      .filter(qs.indices.map(i =>
        col("approx_p").getItem(i) < col("lo").getItem(i) ||
          col("approx_p").getItem(i) > col("hi").getItem(i)).reduce(_ || _))
      .count()
    // HASH-GREEN face (the q28/q64 move): the gated output is the exact
    // ORDER STATISTIC at rank floor(q·(n−1))+1 per group — element
    // selection, no interpolation arithmetic, so the doubles replay
    // bit-for-bit in any engine — while the sketch stays exercised and
    // bound-gated above (off-bracket approx zeroes the output).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val ranked = li.select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
    def pick(q: Double) = floor(lit(q) * (col("n") - 1)).cast("long") + 1
    val out = ranked.groupBy(col("l_returnflag")).agg(
        max(when(col("rn") === pick(0.5), col("l_extendedprice"))).as("p50"),
        max(when(col("rn") === pick(0.95), col("l_extendedprice"))).as("p95"),
        max(when(col("rn") === pick(0.99), col("l_extendedprice"))).as("p99"))
      .orderBy(col("l_returnflag"))
    if (offBound == 0L) out else out.limit(0)
  }

  private val q73Sql =
    """WITH ranked AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  MAX(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 THEN l_extendedprice END) AS p50,
      |  MAX(CASE WHEN rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1 THEN l_extendedprice END) AS p95,
      |  MAX(CASE WHEN rn = CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1 THEN l_extendedprice END) AS p99
      |FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Bucketed co-located join: both sides written bucket-sorted by the
    * join key (the shuffle paid once at write time), then joined with NO
    * exchange on either side (plan-asserted in BucketingSpec; here the
    * result correctness rides the oracle gate). The write-once/join-many
    * amortization is the point at 100 TB. */
  private def q76(s: SparkSession, d: String): DataFrame = {
    graft.store.Bucketing.writeBucketed(
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice")),
      "q76_li", "l_orderkey", 16)
    graft.store.Bucketing.writeBucketed(
      t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus")),
      "q76_ord", "o_orderkey", 16)
    s.table("q76_li")
      .join(s.table("q76_ord"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(dsum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  private val q76Sql =
    """SELECT o_orderstatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
      |  COUNT(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Ratio-to-report: each nation's share of its region's supplier
    * balance — group aggregate divided by a windowed total over the
    * enclosing group (both sums decimal-exact, the division IEEE-exact,
    * so no rounding is needed for parity). */
  private def q77(s: SparkSession, d: String): DataFrame = {
    // the per-nation AND the windowed region totals both stay DECIMAL
    // (exact, order-independent); doubles appear only at the final
    // division — a double window-sum differs in the last ulp between
    // engines because they add in different orders
    val byNation = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("s_acctbal").cast("decimal(18,2)")).as("bal_dec"))
    byNation
      .withColumn("region_share", col("bal_dec").cast("double") /
        sum(col("bal_dec")).over(Window.partitionBy(col("r_name"))).cast("double"))
      .select(col("r_name"), col("n_name"),
        col("bal_dec").cast("double").as("bal"), col("region_share"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q77Sql =
    """WITH byn AS (
      |  SELECT r_name, n_name,
      |    SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS bal_dec
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, n_name)
      |SELECT r_name, n_name, CAST(bal_dec AS DOUBLE) AS bal,
      |  CAST(bal_dec AS DOUBLE) /
      |    CAST(SUM(bal_dec) OVER (PARTITION BY r_name) AS DOUBLE) AS region_share
      |FROM byn ORDER BY r_name, n_name""".stripMargin

  /** Time-series densification: an hourly spine per user (min..max event
    * hour) left-joined to hourly counts, gaps zero-filled — the standard
    * pre-step for rolling features over sparse activity. The spine is
    * sequence+explode (generated, never materialized on the driver). */
  private def q78(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events").filter(col("user_id") < 5)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
    val bounds = e.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = bounds.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val counts = e.groupBy(col("user_id"), col("hour")).agg(count(lit(1)).as("n"))
    spine.join(counts, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("user_id"), col("hour"))
  }

  private val q78Sql =
    """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS hour
      |           FROM events WHERE user_id < 5),
      |bounds AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
      |           FROM e GROUP BY user_id),
      |spine AS (SELECT user_id,
      |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      |  FROM bounds),
      |counts AS (SELECT user_id, hour, COUNT(*) AS n FROM e GROUP BY 1, 2)
      |SELECT spine.user_id, spine.hour, COALESCE(counts.n, 0) AS n
      |FROM spine LEFT JOIN counts USING (user_id, hour)
      |ORDER BY user_id, hour""".stripMargin

  /** Boolean/conditional aggregates: count_if, bool_and, bool_or. */
  private def q79(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(count_if(col("value") > 250.0).as("n_big"),
        bool_and(col("value") > 0.0).as("all_positive"),
        bool_or(col("value") > 480.0).as("any_near_max"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  private val q79Sql =
    """SELECT event_type,
      |  CAST(count_if(value > 250.0) AS BIGINT) AS n_big,
      |  bool_and(value > 0.0) AS all_positive,
      |  bool_or(value > 480.0) AS any_near_max,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Forward fill (last-observation-carried-forward): per-user gap
    * imputation of a sparse measure with `last(_, ignoreNulls)` over the
    * running frame — one shuffle, the time-series cousin of q23's as-of
    * carry. Nulls are synthesized deterministically (k % 7) since the
    * testdata props are fully populated. */
  private def q80(s: SparkSession, d: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    val kn = when(k % 7 === 0, lit(null).cast("long")).otherwise(k)
    t(s, d, "events")
      .filter(col("user_id") < 40)
      .select(col("event_id"), col("user_id"), kn.as("k_sparse"))
      .withColumn("k_filled", last(col("k_sparse"), ignoreNulls = true).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("event_id"))
  }

  private val q80Sql =
    """SELECT event_id, user_id, k_sparse,
      |  last_value(k_sparse IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k_filled
      |FROM (
      |  SELECT event_id, user_id,
      |    CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
      |         THEN NULL
      |         ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k_sparse
      |  FROM events WHERE user_id < 40) x
      |ORDER BY event_id""".stripMargin

  /** Cohort retention — the classic product-analytics matrix: users
    * bucketed by first-activity week, counted again at each later week
    * offset. Two aggregations over ONE user-keyed shuffle lineage: the
    * first-week min is a groupBy, the (user, week) activity set
    * dedups map-side, and offsets are exact integer day arithmetic
    * (date_trunc('week') is ISO-Monday in both engines). */
  private def q116(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    ev.join(cohort, "user_id")
      .withColumn("week_offset",
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  private val q116Sql =
    """WITH ev AS (SELECT DISTINCT user_id,
      |    CAST(DATE_TRUNC('week', ts) AS DATE) AS wk FROM events),
      |c AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id)
      |SELECT cohort_week,
      |  CAST(DATEDIFF('day', cohort_week, wk) // 7 AS BIGINT) AS week_offset,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM ev JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** Data-contract quarantine over the ingest batch: four expectations
    * (range cap, enum membership, payload shape, FK existence) checked
    * in ONE codegen projection via [[graft.operators.Expectations]];
    * the FK rule is a broadcast semi-join flag, so nothing about the
    * contract scan shuffles. Emits the quarantined rows with their
    * sorted violation lists — the audit trail a 100 TB ingest keeps
    * instead of aborting the load (reference deserializes blind,
    * MongoDbService.cs:479-520). */
  private def q127(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Expectations
    import graft.operators.Expectations.Rule
    val custKeys = t(s, d, "customer").select(col("c_custkey")).distinct()
    val flagged = t(s, d, "events")
      .join(broadcast(custKeys), col("user_id") === col("c_custkey"), "left")
    val rules = Seq(
      Rule("value_cap", col("value") <= 300),
      Rule("type_known", col("event_type").isin("view", "click", "purchase", "signup")),
      Rule("props_k_range",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").between(0, 79)),
      Rule("user_fk", col("c_custkey").isNotNull))
    Expectations.annotate(flagged, rules)
      .filter(size(col("violations")) > 0)
      .select(col("event_id"), array_join(col("violations"), ",").as("violations"))
      .orderBy(col("event_id"))
  }

  private val q127Sql =
    """WITH fk AS (SELECT DISTINCT c_custkey FROM customer),
      |a AS (
      |  SELECT e.event_id,
      |    list_filter([
      |      CASE WHEN coalesce(TRY_CAST(regexp_extract(e.props, '"k": (\d+)', 1) AS BIGINT) BETWEEN 0 AND 79, false) THEN NULL ELSE 'props_k_range' END,
      |      CASE WHEN coalesce(e.event_type IN ('view','click','purchase','signup'), false) THEN NULL ELSE 'type_known' END,
      |      CASE WHEN f.c_custkey IS NOT NULL THEN NULL ELSE 'user_fk' END,
      |      CASE WHEN coalesce(e.value <= 300, false) THEN NULL ELSE 'value_cap' END
      |    ], x -> x IS NOT NULL) AS v
      |  FROM events e LEFT JOIN fk f ON e.user_id = f.c_custkey)
      |SELECT event_id, array_to_string(v, ',') AS violations
      |FROM a WHERE len(v) > 0 ORDER BY event_id""".stripMargin

  /** SCD type-2 history build from the event stream via
    * [[graft.operators.Scd2]]: per-user event_type runs become validity
    * intervals (valid_from/valid_to/version/is_current). One user-keyed
    * shuffle shared by the run-detection lag, run numbering, per-run
    * rollup, and the valid_to lead. */
  private def q128(s: SparkSession, d: String): DataFrame =
    graft.operators.Scd2.fromChanges(t(s, d, "events"),
        keyCol = "user_id", tsCol = "ts",
        stateCols = Seq("event_type"), tieCol = "event_id")
      // warehouse "high date" sentinel for the open interval (2200-01-01:
      // within datetime64[ns] range, unlike 9999-12-31, and NULL-free
      // for the driver compare)
      .withColumn("valid_to",
        coalesce(col("valid_to"), lit("2200-01-01 00:00:00").cast("timestamp")))
      .orderBy(col("user_id"), col("version"))

  private val q128Sql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN LAG(event_type) OVER w IS NULL
      |           OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |r AS (
      |  SELECT user_id, ts, event_type,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      |  FROM g),
      |runs AS (
      |  SELECT user_id, version, MIN(event_type) AS event_type,
      |    MIN(ts) AS valid_from
      |  FROM r GROUP BY user_id, version)
      |SELECT user_id, event_type, valid_from,
      |  COALESCE(LEAD(valid_from) OVER wv,
      |    TIMESTAMP '2200-01-01 00:00:00') AS valid_to, version,
      |  (LEAD(valid_from) OVER wv IS NULL) AS is_current
      |FROM runs
      |WINDOW wv AS (PARTITION BY user_id ORDER BY valid_from, version)
      |ORDER BY user_id, version""".stripMargin

  /** Bloom-pruned fact join via [[graft.operators.BloomPrune]]: the
    * fact scan drops non-urgent-order lineitems at the scan through the
    * codegen BloomFilterMightContain probe (a kB broadcast sketch), so
    * the join Exchange carries matches + fpp·n rows instead of the full
    * fact. Answer identical to the plain join by construction (false
    * positives die in the exact join) — the oracle is the plain SQL
    * join, same physical-property pattern as q27's salted join. */
  private def q131(s: SparkSession, d: String): DataFrame = {
    val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    graft.operators.BloomPrune.prunedJoin(
        t(s, d, "lineitem"), urgent, "l_orderkey", "o_orderkey", fpp = 0.01)
      .groupBy(month(col("o_orderdate")).as("order_month"))
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        ).cast("double").as("revenue"))
      .orderBy(col("order_month"))
  }

  private val q131Sql =
    """SELECT CAST(MONTH(o_orderdate) AS INT) AS order_month, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY order_month""".stripMargin

  /** Linear-interpolated hourly resample of each user's event values
    * via [[graft.operators.Interpolate]] — one union-sort shuffle
    * serves both neighbor scans; exact-grid observations pass through
    * untouched. Oracle replays the identical window + IEEE expression. */
  private def q138(s: SparkSession, d: String): DataFrame =
    graft.operators.Interpolate.linearGrid(
        t(s, d, "events").filter(col("user_id") < 20),
        "user_id", "ts", "value")
      .select(col("user_id"), col("ts"), round(col("vi"), 6).as("vi"))
      .orderBy(col("user_id"), col("ts"))

  private val q138Sql =
    """WITH obs AS (
      |  SELECT user_id AS k, ts, CAST(value AS DOUBLE) AS v, 0 AS tag
      |  FROM events WHERE user_id < 20),
      |bounds AS (
      |  SELECT k, MIN(ts) AS tmin, MAX(ts) AS tmax FROM obs GROUP BY k),
      |grid AS (
      |  SELECT k,
      |    CASE WHEN date_trunc('hour', tmin) < tmin
      |         THEN date_trunc('hour', tmin) + INTERVAL 1 HOUR
      |         ELSE date_trunc('hour', tmin) END AS g0,
      |    date_trunc('hour', tmax) AS g1
      |  FROM bounds),
      |spine AS (
      |  SELECT k, unnest(generate_series(g0, g1, INTERVAL 1 HOUR)) AS ts,
      |    CAST(NULL AS DOUBLE) AS v, 1 AS tag
      |  FROM grid WHERE g0 <= g1),
      |u AS (SELECT * FROM obs UNION ALL SELECT * FROM spine),
      |n AS (
      |  SELECT k, ts, tag,
      |    last_value(CASE WHEN tag = 0 THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER wb AS t0,
      |    last_value(CASE WHEN tag = 0 THEN v END IGNORE NULLS) OVER wb AS v0,
      |    first_value(CASE WHEN tag = 0 THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER wf AS t1,
      |    first_value(CASE WHEN tag = 0 THEN v END IGNORE NULLS) OVER wf AS v1
      |  FROM u
      |  WINDOW
      |    wb AS (PARTITION BY k ORDER BY ts, tag
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY k ORDER BY ts, tag
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT k AS user_id, ts,
      |  round(CASE WHEN t0 = epoch_us(ts) THEN v0
      |    ELSE v0 + (v1 - v0) *
      |      (CAST(epoch_us(ts) - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
      |  END, 6) AS vi
      |FROM n WHERE tag = 1
      |ORDER BY user_id, ts""".stripMargin

  /** SCD2 × as-of composition — the stated purpose of the q128 history
    * build: point-in-time lookups. Probes (purchase events shifted +3h,
    * so the looked-up state is a non-trivial mix of same-run and
    * later-run answers) join the SCD2 validity intervals on
    * `valid_from <= ts < valid_to` (NULL valid_to = open). In-query
    * gate: the interval answer must equal the as-of join against the
    * RAW change events ([[graft.operators.AsOfJoin]]) — any drift
    * between the two lookup paths zeroes the output. The history side
    * enters the lookup join already partitioned by user_id (SCD2's own
    * window shuffle), so the interval lookup adds only the probe-side
    * exchange — plan-asserted in Scd2Spec. */
  private def q147(s: SparkSession, d: String): DataFrame = {
    val events = t(s, d, "events")
    val hist = graft.operators.Scd2.fromChanges(events, "user_id", "ts",
      Seq("event_type"), "event_id")
    val probes = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        (col("ts") + expr("INTERVAL 3 HOURS")).as("ts"))
    val pit = probes.join(hist.withColumnRenamed("user_id", "h_user"),
        probes("user_id") === col("h_user") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("state_at_ts"), col("version"))
    val asof = AsOfJoin.leftAsOf(probes,
      events.select(col("user_id"), col("ts"), col("event_type").as("raw_state")),
      Seq("user_id"), "ts", "ts", Seq("raw_state"))
    val mismatches = pit.join(
        asof.select(col("event_id"), col("asof_raw_state")), Seq("event_id"))
      .filter(!(col("state_at_ts") <=> col("asof_raw_state")))
    val out = pit.orderBy(col("event_id"))
    if (mismatches.isEmpty) out else out.limit(0)
  }

  private val q147Sql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN LAG(event_type) OVER w IS NULL
      |           OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |r AS (
      |  SELECT user_id, ts, event_type,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      |  FROM g),
      |runs AS (
      |  SELECT user_id, version, MIN(event_type) AS event_type,
      |    MIN(ts) AS valid_from
      |  FROM r GROUP BY user_id, version),
      |hist AS (
      |  SELECT user_id, event_type, valid_from,
      |    LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, version) AS valid_to,
      |    version
      |  FROM runs),
      |probes AS (
      |  SELECT user_id, event_id, ts + INTERVAL 3 HOUR AS ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, p.event_id, p.ts, h.event_type AS state_at_ts, h.version
      |FROM probes p JOIN hist h ON p.user_id = h.user_id
      |  AND p.ts >= h.valid_from AND (h.valid_to IS NULL OR p.ts < h.valid_to)
      |ORDER BY p.event_id""".stripMargin

  /** The customers table with deterministic synthetic coordinates — the
    * reference's `Location` GeoJSON point (Customer.cs:79-89) re-derived
    * from c_custkey so the DuckDB oracle computes bit-identical inputs
    * (integer → double, divide, add: all IEEE-correctly-rounded in both
    * engines). Jittered pseudo-grid: no two points are mathematically
    * equidistant from a probe, so near-boundary/near-tie decisions are
    * stable across engines' last-ulp trig differences. */
  private def custGeo(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(
      col("c_custkey"),
      (((col("c_custkey") * 37) % 1400) / 10.0 - 70.0 + 0.05).as("lat"),
      (((col("c_custkey") * 91) % 3600) / 10.0 - 180.0 + 0.05).as("lon"))

  private val custGeoSql =
    """geo AS (SELECT c_custkey,
      |  ((c_custkey * 37) % 1400) / 10.0 - 70.0 + 0.05 AS lat,
      |  ((c_custkey * 91) % 3600) / 10.0 - 180.0 + 0.05 AS lon
      |  FROM customer)""".stripMargin

  /** Radius filter over the Location field via [[graft.operators.Geo]]:
    * customers within 2500 km of a store at (10.05, 20.05). Two-phase
    * plan — sargable bounding box, then exact haversine refine; the
    * oracle replays the identical closed-form trig, and the compared
    * output is the integer membership (the boundary decisions ARE the
    * distance math under test). */
  private def q145(s: SparkSession, d: String): DataFrame =
    graft.operators.Geo.withinRadius(custGeo(s, d), "lat", "lon",
        centerLat = 10.05, centerLon = 20.05, radiusKm = 2500.0)
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  private val q145Sql =
    s"""WITH $custGeoSql
       |SELECT c_custkey FROM geo
       |WHERE ${graft.operators.Geo.haversineSql("lat", "lon", "10.05", "20.05")} <= 2500.0
       |ORDER BY c_custkey""".stripMargin

  /** Nearest-8 customers per probe by great-circle distance
    * ([[graft.operators.Geo.nearestK]]): probes broadcast, map-side
    * partial top-k, only k-sized heaps shuffle. Compared output is
    * (probe, neighbor, rank) — integer rank order over the jittered
    * coordinates is ulp-stable. */
  private def q146(s: SparkSession, d: String): DataFrame = {
    val g = custGeo(s, d)
    graft.operators.Geo.nearestK(g, "c_custkey", "lat", "lon",
        g.filter(col("c_custkey") <= 5), "c_custkey", "lat", "lon", k = 8)
      .select(col("probe_id"), col("c_custkey"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  private val q146Sql =
    s"""WITH $custGeoSql,
       |p AS (SELECT c_custkey AS probe_id, lat AS plat, lon AS plon
       |      FROM geo WHERE c_custkey <= 5),
       |d AS (SELECT p.probe_id, g.c_custkey,
       |        ${graft.operators.Geo.haversineSql("g.lat", "g.lon", "p.plat", "p.plon")} AS dist
       |      FROM geo g CROSS JOIN p),
       |r AS (SELECT probe_id, c_custkey,
       |        ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY dist, c_custkey) AS rn
       |      FROM d)
       |SELECT probe_id, c_custkey, rn FROM r WHERE rn <= 8
       |ORDER BY probe_id, rn""".stripMargin

  /** All-pairs geo radius join ([[graft.operators.Geo.radiusJoin]]):
    * customer pairs within 800 km, cell-grid equi-join + haversine
    * refine — the table×table companion to q145/q146 (those serve one
    * center / few probes; this one scales to corpus×corpus because the
    * shuffle key is the spatial cell, never the cross product). The
    * oracle replays the O(n²) cross join in DuckDB — affordable at the
    * verify SF, and exactly the plan shape the operator exists to
    * avoid at scale. Compared output is the pair membership (the
    * boundary decisions are the shared closed-form trig). */
  private def q149(s: SparkSession, d: String): DataFrame = {
    val g = custGeo(s, d)
    graft.operators.Geo.radiusJoin(g, "c_custkey", "lat", "lon",
        g, "c_custkey", "lat", "lon", radiusKm = 800.0)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }

  private val q149Sql =
    s"""WITH $custGeoSql
       |SELECT g1.c_custkey AS a_id, g2.c_custkey AS b_id
       |FROM geo g1 JOIN geo g2 ON g1.c_custkey < g2.c_custkey
       |WHERE ${graft.operators.Geo.haversineSql("g1.lat", "g1.lon", "g2.lat", "g2.lon")} <= 800.0
       |ORDER BY a_id, b_id""".stripMargin

  /** One-pass corpus profile ([[graft.operators.Profiler]]): row/null/
    * exact-distinct counts plus numeric value ranges and string length
    * ranges for every documents column — the trust-but-verify summary a
    * pipeline runs on a new corpus drop. The plan under test is the
    * scale shape: one unpivoted scan, one (column, value)-keyed
    * shuffle (map-side collapsed), NOT per-column jobs or a
    * multi-distinct Expand. The oracle recomputes each column's row
    * with a plain per-column aggregate and unions them. */
  private def q151(s: SparkSession, d: String): DataFrame =
    graft.operators.Profiler.profile(t(s, d, "documents"),
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  private val q151Sql =
    """SELECT 'doc_id' AS column, COUNT(*) AS n_rows, COUNT(doc_id) AS n_nonnull,
      |  COUNT(DISTINCT doc_id) AS n_distinct,
      |  CAST(MIN(doc_id) AS DOUBLE) AS min_d, CAST(MAX(doc_id) AS DOUBLE) AS max_d
      |FROM documents
      |UNION ALL
      |SELECT 'lang', COUNT(*), COUNT(lang), COUNT(DISTINCT lang),
      |  CAST(MIN(LENGTH(lang)) AS DOUBLE), CAST(MAX(LENGTH(lang)) AS DOUBLE)
      |FROM documents
      |UNION ALL
      |SELECT 'n_chars', COUNT(*), COUNT(n_chars), COUNT(DISTINCT n_chars),
      |  CAST(MIN(n_chars) AS DOUBLE), CAST(MAX(n_chars) AS DOUBLE)
      |FROM documents
      |UNION ALL
      |SELECT 'source', COUNT(*), COUNT(source), COUNT(DISTINCT source),
      |  CAST(MIN(LENGTH(source)) AS DOUBLE), CAST(MAX(LENGTH(source)) AS DOUBLE)
      |FROM documents
      |UNION ALL
      |SELECT 'text', COUNT(*), COUNT(text), COUNT(DISTINCT text),
      |  CAST(MIN(LENGTH(text)) AS DOUBLE), CAST(MAX(LENGTH(text)) AS DOUBLE)
      |FROM documents
      |ORDER BY "column"""".stripMargin

  /** Rolling z-score anomaly flags over per-user event telemetry
    * ([[graft.operators.Anomaly.rollingZ]]): each value tested against
    * its own trailing-20 history at 3 sigma, in exact integer
    * arithmetic on cent-scaled values — so the flag set hash-matches a
    * DuckDB replay of the same integer inequality, with no fp
    * stddev/sqrt divergence possible. One shuffle (user partition). */
  private def q152(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events").select(col("event_id"), col("user_id"), col("ts"),
      round(col("value") * 100).cast("long").as("vs"))
    graft.operators.Anomaly.rollingZ(e, Seq("user_id"), Seq("ts", "event_id"),
        "vs", window = 20, k = 3, minPeriods = 8)
      .filter(col("is_anomaly"))
      .select(col("event_id"), col("user_id"), col("vs"), col("n_prev"))
      .orderBy(col("event_id"))
  }

  private val q152Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS vs
      |  FROM events),
      |w AS (
      |  SELECT event_id, user_id, vs,
      |    COUNT(vs) OVER win AS n,
      |    CAST(SUM(vs) OVER win AS BIGINT) AS s,
      |    CAST(SUM(vs * vs) OVER win AS BIGINT) AS q
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id, vs, n AS n_prev FROM w
      |WHERE n >= 8 AND (n * vs - s) * (n * vs - s) > 9 * (n * q - s * s)
      |ORDER BY event_id""".stripMargin

  /** Geofence membership ([[graft.operators.Geo.withinPolygon]]):
    * customers inside a concave pentagon, by ray casting unrolled into
    * per-edge codegen CASE terms (the polygon is a constant, so the
    * whole even-odd test inlines into the scan — no UDF, no explode).
    * The oracle replays the identical per-edge expression shape, so
    * boundary roundings agree. */
  private def q154(s: SparkSession, d: String): DataFrame =
    custGeo(s, d)
      .filter(graft.operators.Geo.withinPolygon(col("lat"), col("lon"), geofencePoly))
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  // concave pentagon over the mid-lat band (notch at the east side)
  private val geofencePoly = Seq(
    (5.0, -20.0), (35.0, -10.0), (30.0, 25.0), (15.0, 5.0), (0.0, 20.0))

  private val q154Sql =
    s"""WITH $custGeoSql
       |SELECT c_custkey FROM geo
       |WHERE ${graft.operators.Geo.withinPolygonSql("lat", "lon", geofencePoly)}
       |ORDER BY c_custkey""".stripMargin

  /** Polygon-SET spatial join ([[graft.operators.Geo.polygonJoin]]):
    * which customers sit in which delivery zones — grid-blocked
    * candidates, HOF ray-cast refine over vertex arrays. The oracle
    * replays the SEMANTICS (cross join + identical per-edge CASE) —
    * the grid is the optimization under test. */
  private def q176(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val polys = Seq(
      (1L, Seq(5.0, 35.0, 30.0, 15.0, 0.0), Seq(-20.0, -10.0, 25.0, 5.0, 20.0)),
      (2L, Seq(-40.0, -30.0, -20.0, -30.0), Seq(-100.0, -85.0, -100.0, -115.0)),
      (3L, Seq(40.0, 60.0, 45.0), Seq(80.0, 90.0, 120.0))
    ).toDF("poly_id", "lats", "lons")
    graft.operators.Geo.polygonJoin(custGeo(s, d), "c_custkey", "lat", "lon",
        polys, "poly_id", "lats", "lons")
      .select(col("c_custkey"), col("poly_id"))
      .orderBy(col("c_custkey"), col("poly_id"))
  }

  private val q176Sql =
    s"""WITH $custGeoSql,
       |polys(poly_id, lats, lons) AS (VALUES
       |  (CAST(1 AS BIGINT), [5.0, 35.0, 30.0, 15.0, 0.0], [-20.0, -10.0, 25.0, 5.0, 20.0]),
       |  (CAST(2 AS BIGINT), [-40.0, -30.0, -20.0, -30.0], [-100.0, -85.0, -100.0, -115.0]),
       |  (CAST(3 AS BIGINT), [40.0, 60.0, 45.0], [80.0, 90.0, 120.0]))
       |SELECT c_custkey, poly_id FROM geo CROSS JOIN polys
       |WHERE (len(list_filter(range(len(lats)), i ->
       |  CASE WHEN lats[i+1] = lats[(i+1) % len(lats) + 1] THEN false
       |       WHEN NOT ((lats[i+1] > lat) <> (lats[(i+1) % len(lats) + 1] > lat)) THEN false
       |       ELSE lon < (lons[(i+1) % len(lats) + 1] - lons[i+1])
       |                  * (lat - lats[i+1])
       |                  / (lats[(i+1) % len(lats) + 1] - lats[i+1])
       |                  + lons[i+1] END)) % 2) = 1
       |ORDER BY c_custkey, poly_id""".stripMargin

  /** PageRank over the supplier↔part co-supply graph
    * ([[graft.operators.PageRank]]): bidirectional bipartite edges from
    * lineitem (supplier 2k ↔ part 2k+1 in one node-id space), 5
    * iterations, damping 0.85, ranks in exact BIGINT micro-units — the
    * link-graph quality prior of a training pipeline, computed with two
    * bounded shuffles per iteration and replayed exactly by the oracle's
    * unrolled integer CTEs (no fp, so engines agree bit-for-bit). */
  private def q155(s: SparkSession, d: String): DataFrame = {
    // cast to LONG before the *2/+1 id arithmetic: INT32 parquet keys at
    // large SF would silently wrap under non-ANSI Spark while the DuckDB
    // oracle widens — an engine/oracle divergence exactly at scale
    val li = t(s, d, "lineitem").select(
      col("l_suppkey").cast("long").as("l_suppkey"),
      col("l_partkey").cast("long").as("l_partkey"))
    val edges = li.select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .union(li.select((col("l_partkey") * 2 + 1).as("src"), (col("l_suppkey") * 2).as("dst")))
    graft.operators.PageRank.run(edges, "src", "dst", iterations = 5)
      .select(
        when(pmod(col("node"), lit(2)) === 0, lit("supplier")).otherwise(lit("part")).as("kind"),
        expr("node div 2").as("entity_id"), col("pr"))
      .orderBy(col("pr").desc, col("kind"), col("entity_id"))
      .limit(30)
  }

  private val q155Sql = {
    val edges =
      """SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
        |   UNION SELECT DISTINCT l_partkey * 2 + 1, l_suppkey * 2 FROM lineitem""".stripMargin
    s"""WITH ${graft.operators.PageRank.oracleCtes(edges, iterations = 5)}
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END AS kind,
       |  node // 2 AS entity_id, pr
       |FROM r5 ORDER BY pr DESC, kind, entity_id LIMIT 30""".stripMargin
  }

  /** Personalized PageRank ([[graft.operators.PageRank]] with `seeds` —
    * the TrustRank construction): teleport mass restarts at suppliers
    * from a vetted nation set, so rank measures proximity-to-trusted
    * rather than global centrality. Same exact BIGINT micro-unit
    * arithmetic as q155 (bit-reproducible, unrolled-CTE-replayable);
    * the seed gate rides the node table, adding zero per-iteration
    * cost. */
  private def q187(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(
      col("l_suppkey").cast("long").as("l_suppkey"),
      col("l_partkey").cast("long").as("l_partkey"))
    val edges = li.select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .union(li.select((col("l_partkey") * 2 + 1).as("src"), (col("l_suppkey") * 2).as("dst")))
    val seeds = t(s, d, "supplier").filter(col("s_nationkey") < 5)
      .select((col("s_suppkey").cast("long") * 2).as("node"))
    graft.operators.PageRank.run(edges, "src", "dst", iterations = 4,
        seeds = Some(seeds))
      .select(
        when(pmod(col("node"), lit(2)) === 0, lit("supplier")).otherwise(lit("part")).as("kind"),
        expr("node div 2").as("entity_id"), col("pr"))
      .orderBy(col("pr").desc, col("kind"), col("entity_id"))
      .limit(30)
  }

  private val q187Sql = {
    val edges =
      """SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
        |   UNION SELECT DISTINCT l_partkey * 2 + 1, l_suppkey * 2 FROM lineitem""".stripMargin
    val seeds = "SELECT s_suppkey * 2 AS node FROM supplier WHERE s_nationkey < 5"
    s"""WITH ${graft.operators.PageRank.oracleCtes(edges, iterations = 4, seedsCte = Some(seeds))}
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END AS kind,
       |  node // 2 AS entity_id, pr
       |FROM r4 ORDER BY pr DESC, kind, entity_id LIMIT 30""".stripMargin
  }

  /** Exact triangle counting ([[graft.operators.Triangles]], degree-
    * ordered orientation) over the co-purchase graph: parts are linked
    * when they appear in the same order; per-part triangle participation
    * is the local-clustering signal. The oracle replays the SEMANTICS
    * (canonical a<b<c triple join) — orientation is the engine's
    * optimization under test, not part of the contract. */
  private def q188(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey").cast("long").as("p"))
    val edges = li.withColumnRenamed("p", "pa")
      .join(li.withColumnRenamed("p", "pb"), "l_orderkey")
      .filter(col("pa") =!= col("pb"))
      .select(col("pa").as("a"), col("pb").as("b"))
    graft.operators.Triangles.perNode(edges, "a", "b")
      .orderBy(col("n_tri").desc, col("node"))
      .limit(30)
  }

  private val q188Sql =
    """WITH pe AS (
      |  SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS u,
      |    greatest(x.l_partkey, y.l_partkey) AS v
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey),
      |tri AS (
      |  SELECT t1.u AS x, t1.v AS y, t2.v AS z
      |  FROM pe t1
      |  JOIN pe t2 ON t2.u = t1.v
      |  JOIN pe t3 ON t3.u = t1.u AND t3.v = t2.v),
      |nodes AS (
      |  SELECT x AS node FROM tri
      |  UNION ALL SELECT y FROM tri
      |  UNION ALL SELECT z FROM tri)
      |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
      |FROM nodes GROUP BY node
      |ORDER BY n_tri DESC, node LIMIT 30""".stripMargin

  /** k-core extraction ([[graft.operators.KCore]], iterative peeling to
    * the fixpoint) on the co-purchase parts graph at k=80: the engine
    * peels until no sub-degree node remains (loudly bounded at 8
    * rounds); the oracle unrolls 8 peel CTEs — rounds past the fixpoint
    * are no-ops, so the replay is exact whenever the engine converges
    * within the unroll. */
  private def q190(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey").cast("long").as("p"))
    val edges = li.withColumnRenamed("p", "pa")
      .join(li.withColumnRenamed("p", "pb"), "l_orderkey")
      .filter(col("pa") =!= col("pb"))
      .select(col("pa").as("a"), col("pb").as("b"))
    graft.operators.KCore.kcore(edges, "a", "b", k = 80, maxRounds = 8)
      .orderBy(col("node"))
  }

  private val q190Sql = {
    val edges =
      """SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
        |    greatest(x.l_partkey, y.l_partkey) AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey""".stripMargin
    s"""WITH ${graft.operators.KCore.oracleCtes(edges, k = 80, rounds = 8)}
       |SELECT node, deg FROM core ORDER BY node""".stripMargin
  }

  /** Deterministic label-propagation communities
    * ([[graft.operators.LabelProp]]) over the supplier-part bipartite
    * graph, 3 synchronous rounds: the self-vote damps the 2-coloring
    * oscillation bipartite structure induces under synchronous LPA, and
    * (count DESC, label ASC) tie-breaking makes the trajectory a pure
    * function of the graph — the oracle unrolls it round by round.
    * Output is the community-size histogram. */
  private def q191(s: SparkSession, d: String): DataFrame = {
    // the quantity filter sparsifies the near-complete bipartite graph
    // so the community structure is non-degenerate (the unfiltered graph
    // collapses to two giant labels in one round)
    val li = t(s, d, "lineitem").filter(col("l_quantity") <= 2)
      .select(col("l_suppkey").cast("long").as("l_suppkey"),
        col("l_partkey").cast("long").as("l_partkey"))
    val edges = li.select((col("l_suppkey") * 2).as("src"),
      (col("l_partkey") * 2 + 1).as("dst"))
    graft.operators.LabelProp.run(edges, "src", "dst", iterations = 3)
      .groupBy(col("label")).agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("label"))
      .limit(30)
  }

  private val q191Sql = {
    val edges =
      """SELECT DISTINCT least(l_suppkey * 2, l_partkey * 2 + 1) AS a,
        |    greatest(l_suppkey * 2, l_partkey * 2 + 1) AS b
        |  FROM lineitem WHERE l_quantity <= 2""".stripMargin
    s"""WITH ${graft.operators.LabelProp.oracleCtes(edges, iterations = 3)}
       |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members
       |FROM l3 GROUP BY label ORDER BY n_members DESC, label LIMIT 30""".stripMargin
  }

  /** Weighted PageRank ([[graft.operators.PageRank]] with `weightCol`):
    * the supplier-part graph with edge weight = total shipped quantity —
    * mass splits proportionally to the trade volume, still exact BIGINT
    * micro-units (contribution r·w div Σw), so the trajectory replays
    * as unrolled weighted CTEs. */
  private def q193(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(
      col("l_suppkey").cast("long").as("sk"),
      col("l_partkey").cast("long").as("pk"),
      col("l_quantity").cast("long").as("qty"))
    val edges = li.select((col("sk") * 2).as("src"), (col("pk") * 2 + 1).as("dst"), col("qty"))
      .unionByName(li.select((col("pk") * 2 + 1).as("src"), (col("sk") * 2).as("dst"), col("qty")))
    graft.operators.PageRank.run(edges, "src", "dst", iterations = 4,
        weightCol = Some("qty"))
      .select(
        when(pmod(col("node"), lit(2)) === 0, lit("supplier")).otherwise(lit("part")).as("kind"),
        expr("node div 2").as("entity_id"), col("pr"))
      .orderBy(col("pr").desc, col("kind"), col("entity_id"))
      .limit(30)
  }

  private val q193Sql = {
    val edges =
      """SELECT src, dst, CAST(SUM(qty) AS BIGINT) AS w FROM (
        |    SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst,
        |      CAST(l_quantity AS BIGINT) AS qty FROM lineitem
        |    UNION ALL
        |    SELECT l_partkey * 2 + 1, l_suppkey * 2, CAST(l_quantity AS BIGINT)
        |    FROM lineitem)
        |  GROUP BY src, dst""".stripMargin
    s"""WITH ${graft.operators.PageRank.oracleCtes(edges, iterations = 4, weighted = true)}
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END AS kind,
       |  node // 2 AS entity_id, pr
       |FROM r4 ORDER BY pr DESC, kind, entity_id LIMIT 30""".stripMargin
  }

  /** Multi-source BFS hop distances ([[graft.operators.Bfs]]) from
    * nation-0 suppliers over the sparsified supplier-part graph (the
    * q191 edge set — the full bipartite graph has trivial diameter):
    * per-hop frontier expansion, exact integer distances, early stop on
    * frontier exhaustion inside a fixed unroll the oracle replays
    * (post-exhaustion rounds are no-ops). Output is the hop histogram. */
  private def q194(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").filter(col("l_quantity") <= 2)
      .select(col("l_suppkey").cast("long").as("sk"),
        col("l_partkey").cast("long").as("pk"))
    val edges = li.select((col("sk") * 2).as("a"), (col("pk") * 2 + 1).as("b"))
    val sources = t(s, d, "supplier").filter(col("s_nationkey") === 0)
      .select((col("s_suppkey").cast("long") * 2).as("node"))
    graft.operators.Bfs.hops(edges, "a", "b", sources, maxHops = 6)
      .groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("dist"))
  }

  private val q194Sql = {
    val edges =
      """SELECT DISTINCT least(l_suppkey * 2, l_partkey * 2 + 1) AS a,
        |    greatest(l_suppkey * 2, l_partkey * 2 + 1) AS b
        |  FROM lineitem WHERE l_quantity <= 2""".stripMargin
    val sources =
      "SELECT s_suppkey * 2 AS node FROM supplier WHERE s_nationkey = 0"
    s"""WITH ${graft.operators.Bfs.oracleCtes(edges, sources, hops = 6)}
       |SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM r6 GROUP BY dist ORDER BY dist""".stripMargin
  }

  /** Local clustering coefficients
    * ([[graft.operators.Triangles.clusteringCoefficient]]) over the
    * sparsified co-purchase graph: exact integer triangles/degrees with
    * one closing IEEE division, so the per-part cohesion score replays
    * hash-identically. Top-30 most clique-like parts. */
  private def q197(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").filter(col("l_quantity") <= 2)
      .select(col("l_orderkey"), col("l_partkey").cast("long").as("p"))
    val edges = li.withColumnRenamed("p", "pa")
      .join(li.withColumnRenamed("p", "pb"), "l_orderkey")
      .filter(col("pa") =!= col("pb"))
      .select(col("pa").as("a"), col("pb").as("b"))
    graft.operators.Triangles.clusteringCoefficient(edges, "a", "b")
      .select(col("node"), col("deg"), col("n_tri"), round(col("coef"), 6).as("coef"))
      .orderBy(col("coef").desc, col("node"))
      .limit(30)
  }

  private val q197Sql =
    """WITH pe AS (
      |  SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS u,
      |    greatest(x.l_partkey, y.l_partkey) AS v
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
      |  WHERE x.l_quantity <= 2 AND y.l_quantity <= 2),
      |deg AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |    SELECT u AS node FROM pe UNION ALL SELECT v FROM pe)
      |  GROUP BY node),
      |tri AS (
      |  SELECT t1.u AS x, t1.v AS y, t2.v AS z
      |  FROM pe t1
      |  JOIN pe t2 ON t2.u = t1.v
      |  JOIN pe t3 ON t3.u = t1.u AND t3.v = t2.v),
      |pn AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
      |    SELECT x AS node FROM tri
      |    UNION ALL SELECT y FROM tri
      |    UNION ALL SELECT z FROM tri)
      |  GROUP BY node)
      |SELECT d.node, d.deg,
      |  CAST(COALESCE(pn.n_tri, 0) AS BIGINT) AS n_tri,
      |  round(CAST(COALESCE(pn.n_tri, 0) AS DOUBLE) * 2.0 /
      |        CAST(d.deg * (d.deg - 1) AS DOUBLE), 6) AS coef
      |FROM deg d LEFT JOIN pn USING (node)
      |WHERE d.deg >= 2
      |ORDER BY coef DESC, node LIMIT 30""".stripMargin

  /** Equal-frequency quantile binning ([[graft.operators.Binning]]):
    * price tiers per order priority — NTILE over (value, key) is
    * deterministic rank arithmetic both engines define identically; the
    * emitted bin dictionary (count + realized [lo,hi]) is groups×bins
    * rows. */
  private def q167(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select(col("o_orderkey"),
      col("o_orderpriority"), col("o_totalprice").cast("double").as("v"))
    val binned = graft.operators.Binning.equalFrequency(
      o, "o_orderpriority", "v", "o_orderkey", bins = 10)
    graft.operators.Binning.boundaries(binned, "o_orderpriority", "v")
      .orderBy(col("o_orderpriority"), col("bin"))
  }

  private val q167Sql =
    """WITH b AS (
      |  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS v,
      |    NTILE(10) OVER (PARTITION BY o_orderpriority
      |                    ORDER BY CAST(o_totalprice AS DOUBLE), o_orderkey) AS bin
      |  FROM orders)
      |SELECT o_orderpriority, bin, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
      |FROM b GROUP BY o_orderpriority, bin
      |ORDER BY o_orderpriority, bin""".stripMargin

  /** Per-group winsorization ([[graft.operators.Binning.winsorize]]):
    * clip order totals into each priority's [p01, p99] band — values in
    * exact integer CENTS (the q25 parity pattern) so the interpolated
    * band doubles are deterministic in both engines; the output carries
    * integer counts and band extremes only (no double SUM, whose
    * accumulation order is partitioning-dependent). */
  private def q168(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select(col("o_orderpriority"),
      round(col("o_totalprice") * 100).cast("bigint").as("__cents"))
    graft.operators.Binning.winsorize(o, "o_orderpriority", "__cents", 0.01, 0.99)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum((col("__cents") < col("w_lo")).cast("long")).as("n_lo_clipped"),
        sum((col("__cents") > col("w_hi")).cast("long")).as("n_hi_clipped"),
        round(min(col("w_lo")), 4).as("w_lo"),
        round(max(col("w_hi")), 4).as("w_hi"),
        round(min(col("__cents_w")), 4).as("min_w"),
        round(max(col("__cents_w")), 4).as("max_w"))
      .orderBy(col("o_orderpriority"))
  }

  private val q168Sql =
    """WITH o AS (
      |  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS c
      |  FROM orders),
      |b AS (
      |  SELECT o_orderpriority,
      |    quantile_cont(c, 0.01) AS w_lo, quantile_cont(c, 0.99) AS w_hi
      |  FROM o GROUP BY o_orderpriority),
      |j AS (
      |  SELECT o.o_orderpriority, c, w_lo, w_hi,
      |    greatest(w_lo, least(w_hi, CAST(c AS DOUBLE))) AS cw
      |  FROM o JOIN b USING (o_orderpriority))
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN CAST(c AS DOUBLE) < w_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo_clipped,
      |  CAST(SUM(CASE WHEN CAST(c AS DOUBLE) > w_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_clipped,
      |  round(MIN(w_lo), 4) AS w_lo, round(MAX(w_hi), 4) AS w_hi,
      |  round(MIN(cw), 4) AS min_w, round(MAX(cw), 4) AS max_w
      |FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Per-group OLS trend ([[graft.operators.Trend]]): order-value drift
    * per priority — x in epoch DAYS, y in CENTS (integer-scaled, so the
    * five sufficient sums are exact BIGINTs and the closed form is
    * engine-bit-stable). */
  private def q173(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select(col("o_orderpriority"),
      datediff(col("o_orderdate"), lit("1970-01-01")).as("x_days"),
      round(col("o_totalprice") * 100).cast("bigint").as("y_cents"))
    graft.operators.Trend.fit(o, "o_orderpriority", "x_days", "y_cents")
      .select(col("o_orderpriority"), col("n"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 4).as("intercept"))
      .orderBy(col("o_orderpriority"))
  }

  private val q173Sql =
    """WITH o AS (
      |  SELECT o_orderpriority,
      |    CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS x,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
      |  FROM orders),
      |a AS (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM o GROUP BY o_orderpriority),
      |f AS (
      |  SELECT o_orderpriority, n,
      |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN NULL
      |         ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |              (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope,
      |    CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
      |  FROM a)
      |SELECT o_orderpriority, n, round(slope, 6) AS slope,
      |  round(CASE WHEN slope IS NULL THEN NULL
      |        ELSE (syd - slope * sxd) / CAST(n AS DOUBLE) END, 4) AS intercept
      |FROM f ORDER BY o_orderpriority""".stripMargin

  /** First-order Markov transition structure of per-user event sequences
    * ([[graft.operators.Sequences.transitions]]): what follows what, with
    * exact counts and row-conditional probabilities. One high-cardinality
    * window shuffle + one |states|²-bounded aggregate. */
  private def q156(s: SparkSession, d: String): DataFrame =
    graft.operators.Sequences.transitions(t(s, d, "events"),
        partitionCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
        stateCol = "event_type")
      .orderBy(col("from_state"), col("to_state"))

  private val q156Sql =
    """WITH s AS (
      |  SELECT event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |c AS (
      |  SELECT prev AS from_state, event_type AS to_state, COUNT(*) AS n
      |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
      |SELECT from_state, to_state, n,
      |  round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_state) AS DOUBLE), 6) AS prob
      |FROM c ORDER BY from_state, to_state""".stripMargin

  /** Pareto skyline of urgent orders on (price, recency)
    * ([[graft.operators.Skyline]]): the orders no other urgent order
    * beats on both criteria. Two-phase local-frontier prune — never the
    * O(n²) self-join the oracle replays (affordable only at verify SF,
    * which is exactly why the operator exists). */
  private def q160(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp").cast("long").as("od"))
    graft.operators.Skyline.skyline(o, Seq("o_totalprice", "od"))
      .orderBy(col("o_orderkey"))
  }

  private val q160Sql =
    """WITH o AS (
      |  SELECT o_orderkey, o_totalprice, CAST(epoch(o_orderdate) AS BIGINT) AS od
      |  FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT o_orderkey, o_totalprice, od FROM o a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM o b
      |  WHERE b.o_totalprice >= a.o_totalprice AND b.od >= a.od
      |    AND (b.o_totalprice > a.o_totalprice OR b.od > a.od))
      |ORDER BY o_orderkey""".stripMargin

  /** Frequent itemset pairs over order baskets (Apriori level 2):
    * which parts co-occur in an order beyond chance, with exact
    * support counts and confidence/lift from single closing
    * divisions. Pair space is the within-basket self-join Σ|basket|²
    * (never n²); `maxItemDf` is the hot-item lever with loud
    * accounting. See [[graft.operators.Itemsets]]. */
  private def q204(s: SparkSession, d: String): DataFrame =
    graft.operators.Itemsets.frequentPairs(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 2L)
      .orderBy(col("item_a"), col("item_b"))

  private val q204Sql =
    """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
      |cnt AS (SELECT i, COUNT(*) AS c FROM items GROUP BY i),
      |n AS (SELECT COUNT(DISTINCT o) AS nb FROM items),
      |pairs AS (SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_pair
      |  FROM items a JOIN items b ON a.o = b.o AND a.i < b.i
      |  GROUP BY a.i, b.i HAVING COUNT(*) >= 2)
      |SELECT item_a, item_b, n_pair, ca.c AS n_a, cb.c AS n_b,
      |  CAST(n_pair AS DOUBLE) / CAST(ca.c AS DOUBLE) AS conf,
      |  CAST(n_pair * (SELECT nb FROM n) AS DOUBLE)
      |    / CAST(ca.c * cb.c AS DOUBLE) AS lift
      |FROM pairs JOIN cnt ca ON ca.i = item_a JOIN cnt cb ON cb.i = item_b
      |ORDER BY item_a, item_b""".stripMargin

  /** Recency-weighted engagement per user: half-life-decayed event
    * value with EXACT dyadic weights — value·2^(maxAge−age) accumulates
    * in DECIMAL(38,2) (order-independent), one decimal→double cast and
    * one power-of-two division close. Partitioning-invariant despite
    * being "floating point". See [[graft.operators.Decay]]. */
  private def q207(s: SparkSession, d: String): DataFrame =
    graft.operators.Decay.halfLife(
        t(s, d, "events").select(col("user_id"), col("ts"), col("value")),
        "user_id", "ts", "value", periodDays = 7, maxAge = 20)
      .orderBy(col("user_id"))

  private val q207Sql =
    """WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS r FROM events),
      |a AS (SELECT user_id,
      |    LEAST(date_diff('day', CAST(ts AS DATE), (SELECT r FROM ref)) // 7,
      |          20) AS age,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events),
      |sc AS (SELECT user_id,
      |    CAST(v * CAST(power(2, 20 - age) AS DECIMAL(18,0)) AS DECIMAL(38,2)) AS s
      |  FROM a)
      |SELECT user_id, COUNT(*) AS n,
      |  CAST(SUM(s) AS DOUBLE) / power(2, 20) AS decayed
      |FROM sc GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Sampled-source harmonic centrality over the co-supply graph:
    * H(v) = Σ_s 1/d(s,v) from five supplier seeds within 4 hops —
    * the disconnection-tolerant centrality (unreached pairs add 0),
    * estimated from a bounded seed sample as at scale. Runs as ONE
    * BFS on the seed-product graph (node' = seed·2^40 + node); exact
    * integer distances, ordered fold over seeds. See
    * [[graft.operators.Bfs.harmonicCentrality]]. */
  private def q217(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").filter(col("l_quantity") <= 2)
      .select((col("l_suppkey").cast("long") * 2).as("a"),
        (col("l_partkey").cast("long") * 2 + 1).as("b"))
    graft.operators.Bfs.harmonicCentrality(li, "a", "b",
        seeds = Seq(2L, 4L, 6L, 8L, 10L), maxHops = 4)
      .select(col("node"), col("n_seeds_reached"), col("harmonic"))
      .orderBy(col("node"))
  }

  private val q217Sql = {
    val big = 1L << 40
    val edges =
      s"""SELECT DISTINCT sd.s * $big + least(l_suppkey * 2, l_partkey * 2 + 1) AS a,
         |    sd.s * $big + greatest(l_suppkey * 2, l_partkey * 2 + 1) AS b
         |  FROM lineitem CROSS JOIN (SELECT unnest([2, 4, 6, 8, 10]) AS s) sd
         |  WHERE l_quantity <= 2""".stripMargin
    val sources =
      s"SELECT s * $big + s AS node FROM (SELECT unnest([2, 4, 6, 8, 10]) AS s)"
    s"""WITH ${graft.operators.Bfs.oracleCtes(edges, sources, hops = 4)}
       |SELECT nd AS node, CAST(COUNT(*) AS BIGINT) AS n_seeds_reached,
       |  list_reduce(list_transform(list(dist ORDER BY seed),
       |    d_ -> 1.0 / CAST(d_ AS DOUBLE)), (x, y) -> x + y) AS harmonic
       |FROM (SELECT node // $big AS seed, node % $big AS nd, dist
       |      FROM r4 WHERE dist > 0)
       |GROUP BY nd ORDER BY node""".stripMargin
  }

  /** Rolling 7-day distinct users (WAU) — the rolling-distinct shape a
    * plain window CANNOT express (distinct doesn't decompose over
    * frames): each event joins the ≤7 observed window-end days it
    * covers (cover factor = window length, a narrow bounded join with
    * the broadcast day table), then one distinct-count per window end.
    * The mergeable-sketch path is gated IN-QUERY (q28 pattern): the
    * HLL estimate per day must sit within 5·rsd of exact or the
    * output zeroes — exact is the verify-scale gate, the sketch is
    * the 100 TB operator (bounded state, mergeable across days). */
  private def q220(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val days = ev.select(col("day").as("win_end")).distinct()
    val cover = ev.join(broadcast(days),
      col("win_end") >= col("day") && col("win_end") <= date_add(col("day"), 6))
    val exact = cover.groupBy(col("win_end"))
      .agg(countDistinct(col("user_id")).as("wau"))
    val est = cover.groupBy(col("win_end"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("wau_est"))
    val offBound = exact.join(est, "win_end")
      .filter(abs(col("wau_est") - col("wau")) >
        lit(5 * 0.02) * col("wau").cast("double"))
      .count()
    val out = exact.orderBy(col("win_end"))
    if (offBound == 0L) out else out.limit(0)
  }

  private val q220Sql =
    """WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day AS win_end FROM ev)
      |SELECT win_end, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      |FROM ev e JOIN days d ON d.win_end >= e.day AND d.win_end <= e.day + 6
      |GROUP BY win_end ORDER BY win_end""".stripMargin

  override val queries: Seq[Q] = Seq(
    Q("q23_asof_join", q23, Some(q23Sql), headline = true),
    Q("q24_sessionize", q24, Some(q24Sql), headline = true),
    Q("q25_percentiles", q25, Some(q25Sql)),
    Q("q26_corr_subquery", q26, Some(q26Sql)),
    Q("q27_skew_salted_join", q27, Some(q27Sql), headline = true),
    Q("q28_approx_distinct", q28, Some(q28Sql)),
    Q("q29_full_outer_join", q29, Some(q29Sql)),
    Q("q52_tpch_q3_topk", q52, Some(q52Sql), headline = true),
    Q("q53_case_agg", q53, Some(q53Sql)),
    Q("q54_funnel_range_join", q54, Some(q54Sql)),
    Q("q55_cube", q55, Some(q55Sql)),
    Q("q57_pattern_predicates", q57, Some(q57Sql)),
    Q("q56_stats_moments", q56, Some(q56Sql)),
    Q("q58_window_analytics", q58, Some(q58Sql)),
    Q("q59_grouping_sets", q59, Some(q59Sql)),
    Q("q63_datetime_funcs", q63, Some(q63Sql)),
    Q("q68_unpivot", q68, Some(q68Sql)),
    Q("q204_frequent_itemsets", q204, Some(q204Sql)),
    Q("q207_decayed_engagement", q207, Some(q207Sql)),
    Q("q217_harmonic_centrality", q217, Some(q217Sql)),
    Q("q220_rolling_distinct", q220, Some(q220Sql)),
    Q("q71_range_frame_window", q71, Some(q71Sql)),
    Q("q72_nullsafe_join", q72, Some(q72Sql)),
    Q("q73_approx_percentiles", q73, Some(q73Sql)),
    Q("q76_bucketed_join", q76, Some(q76Sql)),
    Q("q77_ratio_to_report", q77, Some(q77Sql)),
    Q("q78_densify_timeseries", q78, Some(q78Sql)),
    Q("q79_boolean_aggs", q79, Some(q79Sql)),
    Q("q80_forward_fill", q80, Some(q80Sql)),
    Q("q116_cohort_retention", q116, Some(q116Sql)),
    Q("q127_expectations_quarantine", q127, Some(q127Sql)),
    Q("q128_scd2_history", q128, Some(q128Sql)),
    Q("q131_bloom_pruned_join", q131, Some(q131Sql), headline = true),
    Q("q138_linear_interpolate", q138, Some(q138Sql)),
    Q("q145_geo_radius", q145, Some(q145Sql)),
    Q("q146_geo_nearest", q146, Some(q146Sql)),
    Q("q147_scd2_asof", q147, Some(q147Sql)),
    Q("q149_geo_radius_join", q149, Some(q149Sql)),
    Q("q151_profile_corpus", q151, Some(q151Sql)),
    Q("q152_rolling_zscore", q152, Some(q152Sql)),
    Q("q154_geo_fence", q154, Some(q154Sql)),
    Q("q155_pagerank", q155, Some(q155Sql), headline = true),
    Q("q167_quantile_binning", q167, Some(q167Sql)),
    Q("q168_winsorize", q168, Some(q168Sql)),
    Q("q173_trend_fit", q173, Some(q173Sql)),
    Q("q176_polygon_join", q176, Some(q176Sql)),
    Q("q156_markov_transitions", q156, Some(q156Sql)),
    Q("q160_skyline", q160, Some(q160Sql)),
    Q("q187_personalized_pagerank", q187, Some(q187Sql)),
    Q("q188_triangle_count", q188, Some(q188Sql)),
    Q("q190_kcore", q190, Some(q190Sql)),
    Q("q191_label_propagation", q191, Some(q191Sql)),
    Q("q193_weighted_pagerank", q193, Some(q193Sql)),
    Q("q194_bfs_hops", q194, Some(q194Sql)),
    Q("q197_clustering_coefficient", q197, Some(q197Sql)))
}
