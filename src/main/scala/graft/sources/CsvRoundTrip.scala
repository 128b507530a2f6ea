package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Lossless CSV interchange — the landing-zone format the reference's
  * blob-ingest path (JsonIngest, reference Vectorize/IngestDocs) never
  * covers, but every real data drop includes.
  *
  * CSV is only a safe interchange format with ALL of these pinned (the
  * defaults silently corrupt round trips):
  *
  *  - RFC-4180 quoting: quote `"`, escape by quote doubling (`escape`
  *    set to `"` — Spark's default `\` escape is NOT RFC and breaks
  *    readers that are);
  *  - embedded newlines require `multiLine=true` on read (else a quoted
  *    field with a newline splits the record);
  *  - NULL vs empty string are distinguishable only with a dedicated
  *    `nullValue` sentinel (both serialize to nothing by default —
  *    `emptyValue` pins the empty string to `""` explicitly);
  *  - an explicit read schema: header round trips names, never types.
  *
  * Scale note — splittability: `multiLine=true` makes a CSV file
  * non-splittable (a record boundary can't be found mid-file), so each
  * file is one task and parallelism = file count. But embedded newlines
  * are the EXCEPTION in real data, and paying single-task-per-file for
  * data that provably has none is waste. So [[write]] records a
  * write-time "no newlines in any string field" stat in a
  * `_graft_csv_meta.json` sidecar (one extra column-pruned aggregate
  * pass over just the string columns — scan cost, no shuffle), and
  * [[read]] uses it: stat says clean → `multiLine=false`, files split
  * on block boundaries like any line-oriented format; stat says
  * newlines (or no sidecar — foreign data) → the safe non-splittable
  * path. `requireSplittable=true` turns that fallback into a loud
  * failure instead of a silent 1-task-per-file plan.
  */
object CsvRoundTrip {

  /** The null sentinel: a string that cannot collide with real data
    * containing commas, quotes, or newlines (it would be quoted away);
    * callers whose data could contain the literal sentinel pick another. */
  val NullSentinel = "\\N"

  /** Sidecar file name. Underscore prefix = ignored by Spark's file
    * listing, so the reader never parses it as data. */
  val MetaFile = "_graft_csv_meta.json"

  /** True iff any string column of any row contains an embedded newline
    * (CR or LF). One aggregate pass; non-string columns can never
    * serialize a newline, so only string columns are scanned (column-
    * pruned at the source when the input is parquet). */
  private[sources] def hasNewlines(df: DataFrame): Boolean = {
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (strCols.isEmpty) false
    else {
      val anyNl = strCols
        .map(c => coalesce(col(c).rlike("[\n\r]"), lit(false)))
        .reduce(_ || _)
      // coalesce: max over an empty table is NULL, and no rows = no newlines
      df.agg(coalesce(max(anyNl), lit(false)).as("nl")).collect()(0).getBoolean(0)
    }
  }

  def write(df: DataFrame, dir: String): Unit = {
    // stat BEFORE the write: `overwrite` may wipe a previous version of
    // the same dir that `df`'s lineage reads from
    val nl = hasNewlines(df)
    df.write
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")        // RFC-4180 quote doubling
      .option("nullValue", NullSentinel)
      .option("emptyValue", "\"\"")
      .mode("overwrite")
      .csv(dir)
    val fs = new Path(dir).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(dir, MetaFile), true)
    try out.write(s"""{"hasNewlines":$nl}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Reads the sidecar stat; None = no sidecar (foreign data — assume
    * the worst, i.e. newlines possible). */
  private def sidecarHasNewlines(spark: SparkSession, dir: String): Option[Boolean] = {
    val p = new Path(dir, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      Some(body.contains("\"hasNewlines\":true"))
    }
  }

  /** @param requireSplittable fail loudly (instead of silently taking
    *   the non-splittable `multiLine` path) when the write-time stat
    *   says embedded newlines exist or no stat was recorded. */
  def read(spark: SparkSession, dir: String, schema: StructType,
           requireSplittable: Boolean = false): DataFrame = {
    val nl = sidecarHasNewlines(spark, dir)
    val splittable = nl.contains(false)
    if (requireSplittable && !splittable)
      throw new IllegalStateException(
        s"splittable CSV read of $dir refused: " + (nl match {
          case Some(true) => "write-time stat records embedded newlines " +
            "in the data — only the non-splittable multiLine path is correct"
          case _ => s"no $MetaFile sidecar (foreign data) — newlines " +
            "cannot be ruled out"
        }))
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", (!splittable).toString) // splittable fast path
      .option("nullValue", NullSentinel)
      .option("emptyValue", "")
      .option("mode", "FAILFAST")    // corruption is loud, never dropped rows
      .csv(dir)
  }
}
