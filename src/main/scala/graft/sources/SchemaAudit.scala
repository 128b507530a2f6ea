package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Schema-drift audit across ingest epochs — the contract gap the store's
  * add-only column evolution does not cover: an upstream producer that
  * "helpfully" starts QUOTING a numeric field (int → string), nulling a
  * required one, or wrapping scalars in arrays ships documents that still
  * parse, still land, and silently corrupt every typed reader downstream.
  * The audit classifies each audited top-level field's RAW JSON value
  * token per document into a fixed cross-engine type vocabulary
  * (missing/null/bool/int/float/string/array/object), censuses
  * (epoch, field, type) counts in ONE pass, and diffs each epoch's
  * DOMINANT type against the previous epoch's: a dominant-type flip is
  * the alert (and [[drifted]] gives the quarantine predicate for the
  * [[graft.operators.Expectations]] machinery).
  *
  * The classifier reads the raw token after `"field":` — string-level on
  * purpose: a parse-then-inspect route (schema_of_json / variant) names
  * types in engine-specific vocabularies, while the token's FIRST
  * CHARACTER is the JSON grammar itself and replays identically in any
  * engine (the oracle runs the same regex). Contract: top-level fields of
  * well-formed JSON; strings may contain escaped quotes.
  *
  * Exactness: the census is one map-side-combined BIGINT aggregate onto
  * the epochs×fields×8 grid; dominance is max-by-(count, type) with the
  * deterministic tie order; the flip flag compares grid rows. All
  * integer/string — hash-exact on any partitioning.
  *
  * Scale shape: ONE corpus pass (the per-field classifiers are one
  * codegen'd projection, exploded to fields×rows before the map-side
  * combine); everything downstream runs on the bounded grid. */
object SchemaAudit {

  /** The raw JSON value token of a top-level field: a quoted string
    * (escapes handled), an array/object opener, a literal, or a number —
    * empty when the field is absent. */
  private def rawToken(doc: Column, field: String): Column =
    regexp_extract(doc,
      "\"" + field + "\"\\s*:\\s*" +
        "(\"(?:[^\"\\\\]|\\\\.)*\"|\\[|\\{|true|false|null|" +
        "-?[0-9][0-9.eE+\\-]*)", 1)

  /** Token → type class in the fixed vocabulary. */
  def typeClass(doc: Column, field: String): Column = {
    val tok = rawToken(doc, field)
    when(tok === "", lit("missing"))
      .when(tok === "null", lit("null"))
      .when(tok === "true" || tok === "false", lit("bool"))
      .when(tok.startsWith("\""), lit("string"))
      .when(tok.startsWith("["), lit("array"))
      .when(tok.startsWith("{"), lit("object"))
      .when(tok.rlike("^-?[0-9]+$"), lit("int"))
      .otherwise(lit("float"))
  }

  /** The (epoch, field, t, n) type census — one corpus pass. */
  def cells(df: DataFrame, epochCol: String, docCol: String,
            fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one audited field")
    df.filter(col(docCol).isNotNull && col(epochCol).isNotNull)
      .select(col(epochCol).cast("long").as("epoch"),
        explode(array(fields.map(f =>
          struct(lit(f).as("field"), typeClass(col(docCol), f).as("t"))
        ): _*)).as("ft"))
      .groupBy(col("epoch"), col("ft.field").as("field"),
        col("ft.t").as("t"))
      .agg(count(lit(1)).as("n"))
  }

  /** Dominance + flip from an (epoch, field, t, n) cell table — the
    * serve face shared by the batch audit and the streaming monitor's
    * ledger state (the psiFromCells pattern). */
  def auditFromCells(cells: DataFrame): DataFrame = {
    // dominant class per (epoch, field): max by (n, type) — the type
    // string breaks count ties deterministically
    val dom = cells
      .groupBy(col("epoch"), col("field"))
      .agg(sum(col("n")).as("n_docs"),
        max(struct(col("n"), col("t"))).as("__m"))
      .select(col("epoch"), col("field"), col("n_docs"),
        col("__m.t").as("dom_type"), col("__m.n").as("n_dom"))
    val w = Window.partitionBy(col("field")).orderBy(col("epoch"))
    dom
      .withColumn("prev_type", lag(col("dom_type"), 1).over(w))
      .withColumn("flipped",
        col("prev_type").isNotNull && col("prev_type") =!= col("dom_type"))
      .orderBy(col("field"), col("epoch"))
  }

  /** One row per (epoch, field): the epoch's type census for the field
    * (n per class, dominant class) plus the previous epoch's dominant
    * and the flip flag. Ordered (field, epoch). */
  def audit(df: DataFrame, epochCol: String, docCol: String,
            fields: Seq[String]): DataFrame =
    auditFromCells(cells(df, epochCol, docCol, fields))

  /** Quarantine predicate for one flipped (epoch, field): documents in
    * `epoch` whose field does NOT carry the pre-flip type — feed to
    * [[graft.operators.Expectations]] / DocumentStore quarantine paths. */
  def drifted(epochCol: String, docCol: String, field: String,
              epoch: Long, expectedType: String): Column =
    col(epochCol).cast("long") === epoch &&
      typeClass(col(docCol), field) =!= expectedType
}
