package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract expectations: declarative row-level rules evaluated in
  * ONE narrow pass, splitting a batch into pass/quarantine with a
  * per-row record of which rules failed.
  *
  * The reference trusts its ingest shape implicitly (Product.cs /
  * Customer.cs are deserialized with no validation; a malformed blob
  * document fails the whole load at MongoDbService.cs:479-520). A
  * 100 TB pipeline can't: one bad row must quarantine, not abort, and
  * the audit trail must say WHY it was held. This is the
  * expectations/quarantine pattern of modern lakehouse pipelines
  * (e.g. the `CONSTRAINT ... ON VIOLATION` clauses of declarative
  * pipeline frameworks, Great-Expectations-style checks), expressed as
  * plain Catalyst columns so every rule stays inside whole-stage
  * codegen.
  *
  * Scale shape: rules are Column predicates — no UDFs, no extra scan.
  * `annotate` adds one array column built from the rules' boolean
  * results; `split` filters it both ways (two narrow reads of the same
  * cached/computed result, or one scan each when the source is a
  * pushdown-friendly file scan). Referential rules (FK membership) are
  * expressed by the caller as a broadcast semi-join flag column BEFORE
  * calling annotate — the rule itself stays a Column.
  */
object Expectations {

  /** One named contract: `check` must evaluate TRUE for a row to pass.
    * NULL results count as violations (contracts are total). */
  final case class Rule(name: String, check: Column)

  /** Adds `violations`: the sorted names of every rule the row fails.
    * Empty array = clean row. One projection, codegen-friendly. */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val names = rules.map(_.name)
    require(names.distinct.size == names.size, s"duplicate rule names: $names")
    val failed = rules.sortBy(_.name).map { r =>
      when(coalesce(r.check, lit(false)), lit(null).cast("string"))
        .otherwise(lit(r.name))
    }
    df.withColumn("violations", filter(array(failed: _*), _.isNotNull))
  }

  /** (clean rows, quarantined rows) — quarantined keep the violations
    * column; clean rows drop it (they re-enter the pipeline unchanged). */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val a = annotate(df, rules)
    (a.filter(size(col("violations")) === 0).drop("violations"),
      a.filter(size(col("violations")) > 0))
  }

  /** Per-rule violation counts from an annotated frame: one explode of
    * the (small) violations arrays + a map-side-combined count. Rules
    * with zero violations are absent (join against the rule list to
    * densify if needed). */
  def audit(annotated: DataFrame): DataFrame =
    annotated.select(explode(col("violations")).as("rule"))
      .groupBy(col("rule")).agg(count(lit(1)).as("n_violations"))
}
