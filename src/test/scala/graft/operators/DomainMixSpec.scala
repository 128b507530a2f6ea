package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class DomainMixSpec extends AnyFunSuite with SparkSuite {

  private val key =
    pmod((col("doc_id") % lit(2147483648L)).bitwiseXOR(lit(7L)) * lit(2654435761L),
      lit(4294967296L))

  private lazy val docs = t(spark, sf, "documents").select(col("doc_id"), col("source"))

  private def quotasOf(df: DataFrame, total: Long): DataFrame = {
    val counts = df.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("w", length(bin(col("n"))).cast("long"))
    val sumW = counts.agg(sum(col("w"))).head().getLong(0)
    counts.withColumn("quota",
        ((lit(total) * col("w")).cast("long") / lit(sumW)).cast("long"))
      .select(col("source"), col("quota"), col("n"))
  }

  private def rows(df: DataFrame): Seq[(String, Long, Int)] =
    df.select(col("source"), col("doc_id"), col("rn"))
      .orderBy(col("source"), col("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq

  test("sampled path is bit-equal to the direct full-window form") {
    val q = quotasOf(docs, 200L)
    assert(rows(DomainMix.sampled(docs, q, key)) == rows(DomainMix.direct(docs, q, key)))
  }

  test("fallback regime (quota ~ n forces a deficient source) stays exact") {
    // total >> corpus: quotas exceed what any threshold fraction keeps,
    // so at least one source must trip the check and take the direct path
    val q = quotasOf(docs, 100000L)
    assert(rows(DomainMix.sampled(docs, q, key)) == rows(DomainMix.direct(docs, q, key)))
  }

  test("fast-path rank window ranks pre-filtered survivors, not the corpus") {
    val q = quotasOf(docs, 200L)
    val plan = DomainMix.sampled(docs, q, key).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected a rank window in the fast path")
    windows.foreach { w =>
      // Catalyst pushes `shuffle_key < thresh` either into a Filter or
      // into the inner join's condition — both sit below the window's
      // partitionBy exchange, which is what matters.
      val filtered = w.child.collectFirst {
        case f: Filter if f.condition.references.exists(_.name == "shuffle_key") => f
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(_.name == "thresh")) => j
      }
      assert(filtered.isDefined,
        "window input must be threshold-filtered BEFORE the partitionBy exchange")
    }
  }

  test("every source fills its exact quota on the fast path") {
    val q = quotasOf(docs, 200L)
    val got = DomainMix.sampled(docs, q, key)
      .groupBy("source").agg(count(lit(1)).as("got"))
      .join(q, Seq("source"))
      .collect()
    got.foreach(r => assert(r.getAs[Long]("got") == r.getAs[Long]("quota"),
      s"source ${r.getString(0)}"))
  }

  // --- token budgets ---

  private lazy val toked = t(spark, sf, "documents")
    .select(col("doc_id"), col("source"),
      size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tokens"))

  private def budgetsOf(df: DataFrame, divisor: Long): DataFrame =
    df.groupBy("source").agg(sum(col("n_tokens")).as("total_tokens"))
      .withColumn("budget_tokens",
        (col("total_tokens") / lit(divisor)).cast("long") + 100L)

  private def tRows(df: DataFrame): Seq[(String, Long, Long)] =
    df.select(col("source"), col("doc_id"), col("n_tokens"))
      .orderBy(col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("token budget: fast path is bit-equal to the direct window form") {
    val b = budgetsOf(toked, 8L)
    assert(tRows(DomainMix.tokenBudget(toked, b, key, "n_tokens")) ==
      tRows(DomainMix.tokenBudgetDirect(toked, b, key, "n_tokens")))
  }

  test("token budget: selection covers the budget minimally per source") {
    val b = budgetsOf(toked, 8L)
    val sel = DomainMix.tokenBudget(toked, b, key, "n_tokens")
    val sums = sel.groupBy("source").agg(sum("n_tokens").as("got"), count(lit(1)).as("cnt"))
      .join(b, Seq("source")).collect()
    sums.foreach { r =>
      val got = r.getAs[Long]("got"); val budget = r.getAs[Long]("budget_tokens")
      assert(got >= budget, s"${r.getString(0)} under budget: $got < $budget")
    }
    // minimality: dropping each source's hash-order-last selected doc
    // must fall below budget (cum_before < budget for every selected row)
    val last = DomainMix.tokenBudgetDirect(toked, b, key, "n_tokens")
    assert(tRows(sel) == tRows(last)) // same set => same minimal prefix
  }

  test("token budget: a source that cannot cover the budget keeps every row") {
    val b = budgetsOf(toked, 8L)
      .withColumn("budget_tokens", col("total_tokens") * 10) // unreachable
    val sel = DomainMix.tokenBudget(toked, b, key, "n_tokens")
    assert(sel.count() == toked.count()) // threshold caps at 2^32: whole source
    assert(tRows(sel) == tRows(DomainMix.tokenBudgetDirect(toked, b, key, "n_tokens")))
  }

  test("token budget: stale totals trip the check and fall back exactly") {
    // overstated totals shrink the threshold so survivors cannot cover
    // the budget -> the checked fallback must fire and stay bit-exact
    val b = budgetsOf(toked, 8L)
      .withColumn("total_tokens", col("total_tokens") * 1000)
    assert(tRows(DomainMix.tokenBudget(toked, b, key, "n_tokens")) ==
      tRows(DomainMix.tokenBudgetDirect(toked, b, key, "n_tokens")))
  }

  test("token budget: fast-path cumsum window runs over survivors, not the corpus") {
    val b = budgetsOf(toked, 8L)
    val plan = DomainMix.tokenBudget(toked, b, key, "n_tokens")
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected a cumsum window in the fast path")
    windows.foreach { w =>
      val filtered = w.child.collectFirst {
        case f: Filter if f.condition.references.exists(_.name == "shuffle_key") => f
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(_.name == "thresh")) => j
      }
      assert(filtered.isDefined,
        "window input must be threshold-filtered BEFORE the partitionBy exchange")
    }
  }
}
