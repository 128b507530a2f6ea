package graft.store

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins and aggregations.
  *
  * At 100 TB the dominant cost of a repeated fact⋈fact join is the
  * shuffle. Writing both sides bucketed (and sorted) by the join key
  * pre-partitions the data ON DISK: Spark's scan reports the bucket
  * hash-partitioning, and the join planner skips the exchange on every
  * subsequent query — the shuffle is paid once at write time, amortized
  * over every read. This is the engine's co-location primitive; the
  * versioned [[DocumentStore]] covers the mutable-document workload and
  * this covers the immutable analytics-fact workload.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. `buckets` should be
    * sized so one bucket of the LARGER table fits an executor's memory
    * (e.g. 100 TB / 4096 buckets ≈ 24 GB splits, each bucket further
    * split by files). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
