package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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
  * Scale note: `multiLine=true` makes a CSV file non-splittable (a
  * record boundary can't be found mid-file), so a 100 TB landing zone
  * must arrive as MANY files — which it does naturally (one per
  * producer/partition); each file is one task, parallelism = file count.
  */
object CsvRoundTrip {

  /** The null sentinel: a string that cannot collide with real data
    * containing commas, quotes, or newlines (it would be quoted away);
    * callers whose data could contain the literal sentinel pick another. */
  val NullSentinel = "\\N"

  def write(df: DataFrame, dir: String): Unit =
    df.write
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")        // RFC-4180 quote doubling
      .option("nullValue", NullSentinel)
      .option("emptyValue", "\"\"")
      .mode("overwrite")
      .csv(dir)

  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true")   // quoted embedded newlines
      .option("nullValue", NullSentinel)
      .option("emptyValue", "")
      .option("mode", "FAILFAST")    // corruption is loud, never dropped rows
      .csv(dir)
}
