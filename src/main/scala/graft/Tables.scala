package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * All `SparkEntry.queries` entries take an `sfDir` (e.g.
  * `/root/testdata/sf0.01`) and read one parquet per table. Reads are
  * plain `spark.read.parquet` so Catalyst pushdown/pruning reach the scan.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (readable only via
    * `spark.sql.legacy.parquet.nanosAsLong`, see [[GraftSession]]) and
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark 4 infers
    * as TIMESTAMP_NTZ). Normalize BOTH to a plain micro-precision
    * TimestampType column: watermarks, `unix_micros`, and range frames
    * require the instant-typed TIMESTAMP, and the session timezone is
    * pinned to UTC so the NTZ→LTZ cast preserves wall-clock values. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
