package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: every entry point (Verify, Bench, tests)
  * builds its session here so configs stay consistent.
  *
  * Scale rationale:
  *  - shuffle.partitions sized to cores for local mode (on a real cluster
  *    this comes from AQE's coalescing anyway);
  *  - AQE on: runtime shuffle coalescing, skew-join splitting, and
  *    dynamic broadcast conversion are the knobs that keep the same plans
  *    healthy at 1000 executors;
  *  - nanosAsLong: the `events` table ships TIMESTAMP(NANOS) parquet,
  *    which vanilla Spark refuses; we read it as long and rebuild a
  *    micro-precision timestamp in [[Tables]].
  */
object GraftSession {
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    spark
  }
}
