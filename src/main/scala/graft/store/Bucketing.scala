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
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // An in-memory catalog forgets tables across sessions while the
    // warehouse directory persists; saveAsTable then refuses to "create"
    // over the stale location. Drop both the catalog entry and any
    // leftover directory so the write is idempotent across sessions.
    // Warehouse-path math only holds for unqualified names in the default
    // database — a db-qualified name resolves elsewhere and the delete
    // below could miss (or hit a sibling path). Resolve the real location
    // from the catalog when the table still exists; otherwise fall back to
    // the default-db layout, which is all an absent table can occupy.
    require(!table.contains("."),
      s"writeBucketed expects an unqualified default-db table name, got '$table'")
    val catalog = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val loc: org.apache.hadoop.fs.Path =
      if (catalog.tableExists(ident))
        new org.apache.hadoop.fs.Path(catalog.getTableMetadata(ident).location)
      else new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, table.toLowerCase)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
