package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler — the data-quality summary a curation
  * pipeline runs before trusting a new corpus drop (row/null/distinct
  * counts, numeric ranges, string length ranges), shaped for 100 TB:
  *
  *  - NOT k independent `SELECT COUNT(DISTINCT c)` jobs (k scans), and
  *    NOT one multi-distinct aggregate (Catalyst plans those through an
  *    Expand that multiplies every input row by k before the shuffle).
  *    Instead the table is unpivoted once to (column, value) pairs and
  *    grouped — ONE scan, one partial-aggregated shuffle keyed by
  *    (column, value), so duplicate values collapse map-side and the
  *    exchange carries the distinct-value set, not the corpus.
  *  - Values travel as strings: Spark's numeric→string cast is
  *    injective (shortest round-trip form), so distinct counts over the
  *    string image equal distinct counts over the native values.
  *  - min/max ride a second driver-trivial aggregate (plain partial
  *    min/max, no shuffle growth): numeric columns report their value
  *    range, string columns their LENGTH range — both exact doubles.
  *    Unsupported types (arrays, structs, binary) profile counts only.
  *
  * Output, one row per requested column:
  * (column, n_rows, n_nonnull, n_distinct, min_d, max_d).
  */
object Profiler {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    columns.foreach(c => require(types.contains(c), s"no such column '$c'"))

    // unpivot via stack: one scan, pairs shuffle once keyed (column, value)
    val stackArgs = columns
      .map(c => s"'${c.replace("'", "''")}', CAST(`$c` AS STRING)")
      .mkString(", ")
    val pairs = df.selectExpr(s"stack(${columns.size}, $stackArgs) AS (column, value)")
    val counts = pairs.groupBy(col("column")).agg(
      count(lit(1)).as("n_rows"),
      count(col("value")).as("n_nonnull"),
      countDistinct(col("value")).as("n_distinct"))

    // exact ranges: one row of partial min/max aggregates, no shuffle
    val rangeExprs: Seq[Column] = columns.flatMap { c =>
      val (lo, hi): (Column, Column) = types(c) match {
        case dt if isNumeric(dt) =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"))
        case StringType =>
          (min(length(col(c))).cast("double"), max(length(col(c))).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      Seq(lo.as(s"__min_$c"), hi.as(s"__max_$c"))
    }
    val rangeRow = df.agg(rangeExprs.head, rangeExprs.tail: _*).head()
    val ranges = columns.zipWithIndex.map { case (c, i) =>
      (c,
        if (rangeRow.isNullAt(2 * i)) None else Some(rangeRow.getDouble(2 * i)),
        if (rangeRow.isNullAt(2 * i + 1)) None else Some(rangeRow.getDouble(2 * i + 1)))
    }
    import df.sparkSession.implicits._
    val rangeDf = ranges.toDF("column", "min_d", "max_d")

    counts.join(broadcast(rangeDf), Seq("column"))
      .select(col("column"), col("n_rows"), col("n_nonnull"), col("n_distinct"),
        col("min_d"), col("max_d"))
      .orderBy(col("column"))
  }
}
