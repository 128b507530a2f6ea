package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Relational operator coverage (SURVEY §2.1-§2.9).
  *
  * The reference's persisted-store surface is point CRUD + one pipeline;
  * its implicit relational semantics (FK joins J1/J3, aggregates A1/A3/A4,
  * window W1, top-k W2, filters F1/F2, projections P1) are expressed here
  * as first-class Spark plans over the TESTDATA tables, each with a DuckDB
  * oracle.
  *
  * Scale notes (100 TB thinking): every groupBy keeps partial aggregation
  * map-side; small dimensions (region/nation/supplier/customer) are
  * broadcast explicitly so the big fact tables never shuffle for those
  * joins; windows partition by high-cardinality keys (user_id, custkey) so
  * no single partition explodes; top-k compiles to TakeOrderedAndProject,
  * never a global sort.
  */
object Relational extends QuerySet {

  // exact money accumulation: double -> decimal(18,2) -> sum -> double
  private def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(18,2)")).cast("double")

  /** TPC-H Q1 shape — scan + filter + hash agg (F1, A1 family). */
  private def q01(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        ).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** S3/F1: collection scan with equality filter + projection (P1). */
  private def q02(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .filter(col("event_type") === "purchase" && col("value") > 100.0)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))

  private val q02Sql =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'purchase' AND value > 100.0
      |ORDER BY event_id""".stripMargin

  /** F2 + range predicates (engine extension beyond the ref's pure-Eq). */
  private def q03(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F" &&
        col("l_quantity").between(10, 20) &&
        col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q03Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_returnflag = 'R' AND l_linestatus = 'F'
      |  AND l_quantity BETWEEN 10 AND 20
      |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** P1/X5: column pruning + string projection with ellipsis truncate. */
  private def q04(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        concat(substring(col("p_name"), 1, 10), lit("...")).as("name_short"))
      .orderBy(col("p_partkey"))

  private val q04Sql =
    """SELECT p_partkey, UPPER(p_brand) AS brand_uc,
      |  SUBSTRING(p_name, 1, 10) || '...' AS name_short
      |FROM part ORDER BY p_partkey""".stripMargin

  /** J1: FK join, small side broadcast (customer is the tiny dim here). */
  private def q05(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
      .orderBy(col("c_mktsegment"))

  private val q05Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** J3 multi-join (TPC-H Q5 shape): fact ⋈ 5 dims, dims broadcast. */
  private def q06(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      ).cast("double").as("revenue"))
      .orderBy(col("n_name"))

  private val q06Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Semi join (EXISTS). */
  private def q07(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val q07Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Anti join (NOT EXISTS): customers with no large order. */
  private def q08(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val q08Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** A3: the denormalized salesOrderCount invariant (Customer.cs:21) —
    * orders per customer, computed instead of stored. */
  private def q09(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("sales_order_count"), max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_custkey"))

  private val q09Sql =
    """SELECT o_custkey, COUNT(*) AS sales_order_count, MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** W1: token-budget suffix window, exact reference semantics
    * (ChatService.cs:258-264): newest-first running sum, keep rows while
    * the sum *including the current row* is <= budget, emit in
    * chronological order. events.value stands in for Message.Tokens. */
  private def q10(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .withColumn("running", sum(col("value").cast("decimal(18,2)")).over(w))
      .filter(col("running") <= lit(500).cast("decimal(18,2)"))
      .select(col("user_id"), col("event_id"), col("running").cast("double").as("running"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q10Sql =
    """SELECT user_id, event_id, CAST(running AS DOUBLE) AS running FROM (
      |  SELECT user_id, event_id,
      |    SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      |  FROM events) w
      |WHERE running <= CAST(500 AS DECIMAL(18,2))
      |ORDER BY user_id, event_id""".stripMargin

  /** W2: global top-k — plans as TakeOrderedAndProject (no full sort). */
  private def q11(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private val q11Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Top-k per group via row_number (the batched multi-probe search shape). */
  private def q12(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q12Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) x
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Ranking + lag/lead ordered analytics. */
  private def q13(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, d, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))).as("price_rank"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q13Sql =
    """SELECT o_custkey, o_orderkey,
      |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
      |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
      |  LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Set operations: INTERSECT + EXCEPT (distinct semantics both engines). */
  private def q14(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val building = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("o_custkey"))
    f.intersect(open).except(building).orderBy(col("o_custkey"))
  }

  private val q14Sql =
    """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      | INTERSECT
      | SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |EXCEPT
      |SELECT c_custkey AS o_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY o_custkey""".stripMargin

  /** Exact distinct (dedup primitive). */
  private def q15(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .distinct()
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  private val q15Sql =
    """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  /** X-family scalar string functions (X3/X4/X5). */
  private def q16(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[^a-zA-Z0-9 ]", "").as("name_clean"),
        lower(col("p_type")).as("type_lc"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  private val q16Sql =
    """SELECT p_partkey,
      |  regexp_replace(p_name, '[^a-zA-Z0-9 ]', '', 'g') AS name_clean,
      |  LOWER(p_type) AS type_lc,
      |  LENGTH(p_name) AS name_len,
      |  p_brand || '|' || p_type AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date functions + monthly aggregation. */
  private def q17(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("monthly_total"))
      .orderBy(col("month"))

  private val q17Sql =
    """SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monthly_total
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** Distinct aggregate + min/max over timestamps. */
  private def q18(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy(col("l_returnflag"))

  private val q18Sql =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows,
      |  MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Explode/unnest (the nested-details pattern, SalesOrder.cs:15) —
    * word count over documents. */
  private def q19(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  private val q19Sql =
    """SELECT word, COUNT(*) AS n FROM (
      |  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents) x
      |WHERE word <> ''
      |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin

  /** JSON extraction over the events.props payload (schema-on-read, S2). */
  private def q20(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  private val q20Sql =
    """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Rollup (grouping sets) over region/nation revenue. */
  private def q21(s: SparkSession, d: String): DataFrame =
    t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("s_acctbal")).as("total_bal"), count(lit(1)).as("n_sup"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  private val q21Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      |  COUNT(*) AS n_sup
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** A4: ordered string-concat fold of a result set per group. */
  private def q22(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"))
      .agg(array_join(array_sort(collect_list(col("event_type"))), " ").as("type_log"))
      .orderBy(col("user_id"))

  private val q22Sql =
    """SELECT user_id, string_agg(event_type, ' ' ORDER BY event_type) AS type_log
      |FROM events WHERE user_id < 20
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Correlated EXISTS / NOT EXISTS subqueries, decorrelated by Catalyst
    * into semi/anti joins (check RewriteCorrelatedScalarSubquery +
    * RewritePredicateSubquery in the optimized plan). Expressed through
    * the SQL surface on purpose — the DataFrame API has no EXISTS. */
  private def q37(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer").createOrReplaceTempView("customer")
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(q37Sql)
  }

  private val q37Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Argument-extreme and positional aggregates: max_by / min_by (with a
    * collision-free composite ordering key — acctbal alone can tie) and
    * exact median. */
  private def q38(s: SparkSession, d: String): DataFrame = {
    // acctbal has 2 decimals and custkey < 1e6: acctbal*1e8 + custkey is
    // injective, so the arg extremes are unique (no tie nondeterminism)
    val key = col("c_acctbal") * lit(100000000.0) + col("c_custkey")
    t(s, d, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        max_by(col("c_name"), key).as("richest"),
        min_by(col("c_name"), key).as("poorest"),
        round(median(col("c_acctbal")), 6).as("med_bal"),
        count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  private val q38Sql =
    """SELECT c_mktsegment,
      |  arg_max(c_name, c_acctbal * 100000000.0 + c_custkey) AS richest,
      |  arg_min(c_name, c_acctbal * 100000000.0 + c_custkey) AS poorest,
      |  round(median(c_acctbal), 6) AS med_bal,
      |  COUNT(*) AS n
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Edit-distance (fuzzy) matching: nearest part names to a probe
    * string — the approximate-string cousin of the engine's similarity
    * surface. */
  private def q39(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"), col("p_name"),
        levenshtein(col("p_name"), lit("small ring")).as("dist"))
      .orderBy(col("dist"), col("p_partkey"))
      .limit(15)

  private val q39Sql =
    """SELECT p_partkey, p_name, levenshtein(p_name, 'small ring') AS dist
      |FROM part ORDER BY dist, p_partkey LIMIT 15""".stripMargin

  /** TPC-H Q18 shape (large-volume customers): HAVING over a fact-table
    * aggregate, then joins back to the dimensions. The HAVING filter
    * runs map-side-combined BEFORE the joins, so only qualifying order
    * keys (a tiny set) ever join — the right order at 100 TB. */
  private def q74(s: SparkSession, d: String): DataFrame = {
    val big = t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
      .filter(col("total_qty") > 150.0) // HAVING
    big
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q74Sql =
    """SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS od, total_qty
      |FROM (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150.0) big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin

  /** Text normalization for training pipelines: lowercase, strip
    * non-printable/control bytes, collapse whitespace runs, trim.
    * Kept to ASCII-safe character classes so Java regex and RE2 agree. */
  private def q75(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^\\x20-\\x7e]", " "), "\\s+", " ")).as("clean_text"))
      .withColumn("clean_len", length(col("clean_text")))
      .orderBy(col("doc_id"))

  private val q75Sql =
    """SELECT doc_id, clean_text, CAST(strlen(clean_text) AS INT) AS clean_len
      |FROM (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),
      |    '[^\x20-\x7e]', ' ', 'g'), '\s+', ' ', 'g')) AS clean_text
      |  FROM documents) x
      |ORDER BY doc_id""".stripMargin

  override val queries: Seq[Q] = Seq(
    Q("q01_agg_pricing", q01, Some(q01Sql), headline = true),
    Q("q02_filter_scan", q02, Some(q02Sql)),
    Q("q03_conj_range_filter", q03, Some(q03Sql)),
    Q("q04_project_prune", q04, Some(q04Sql)),
    Q("q05_join_broadcast", q05, Some(q05Sql), headline = true),
    Q("q06_join_multiway", q06, Some(q06Sql), headline = true),
    Q("q07_semi_join", q07, Some(q07Sql)),
    Q("q08_anti_join", q08, Some(q08Sql)),
    Q("q09_group_count", q09, Some(q09Sql)),
    Q("q10_budget_window", q10, Some(q10Sql), headline = true),
    Q("q11_topk_global", q11, Some(q11Sql)),
    Q("q12_topk_per_group", q12, Some(q12Sql)),
    Q("q13_window_ranking", q13, Some(q13Sql)),
    Q("q14_set_ops", q14, Some(q14Sql)),
    Q("q15_distinct", q15, Some(q15Sql)),
    Q("q16_string_funcs", q16, Some(q16Sql)),
    Q("q17_date_agg", q17, Some(q17Sql)),
    Q("q18_distinct_agg", q18, Some(q18Sql)),
    Q("q19_explode_wordcount", q19, Some(q19Sql)),
    Q("q20_json_extract", q20, Some(q20Sql)),
    Q("q21_rollup", q21, Some(q21Sql)),
    Q("q22_string_agg_fold", q22, Some(q22Sql)),
    Q("q37_exists_subquery", q37, Some(q37Sql)),
    Q("q38_argmax_median", q38, Some(q38Sql)),
    Q("q39_fuzzy_levenshtein", q39, Some(q39Sql)),
    Q("q74_tpch_q18_having", q74, Some(q74Sql)),
    Q("q75_normalize_text", q75, Some(q75Sql)))
}
