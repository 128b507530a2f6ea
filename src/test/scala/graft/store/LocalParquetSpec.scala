package graft.store

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** The driver-local tiny-commit fast path must be indistinguishable from
  * the Spark write path to every reader: same values for every supported
  * atomic type (nulls, timestamps at micro precision, dates), same
  * partition-dir layout, and seamless coexistence with Spark-written
  * segments in later mutations of the same table. */
class LocalParquetSpec extends AnyFunSuite with SparkSuite {

  test("local fast path round-trips all supported atomic types incl. nulls") {
    import java.sql.{Date, Timestamp}
    val ts = Timestamp.valueOf("2026-02-03 04:05:06.123456")
    val rows = Seq(
      Row(1, 10L, 1.5f, 2.5, true, "alpha beta", ts, Date.valueOf("2026-02-03")),
      Row(2, null, null, null, null, null, null, null))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "i INT, l BIGINT, f FLOAT, d DOUBLE, b BOOLEAN, s STRING, t TIMESTAMP, dt DATE")
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    val store = new DocumentStore(spark,
      java.nio.file.Files.createTempDirectory("lp-spec").toString)
    store.create("t", df) // LocalRelation + supported types => fast path
    val back = store.read("t").orderBy(col("i")).collect().toSeq
    assert(back == rows.sortBy(_.getInt(0)))
  }

  test("fast-path partitioned create prunes and coexists with Spark-path upsert") {
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
      .toDF("id", "part", "v")
    val store = new DocumentStore(spark,
      java.nio.file.Files.createTempDirectory("lp-spec2").toString)
    store.create("t", df, partitionCol = Some("part"))
    // partition layout identical to the Spark path: one dir per value
    assert(store.layout("t").keySet == Set("a", "b"))
    assert(store.readPartitions("t", Seq("a")).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // a DISTRIBUTED upsert (falls back to the Spark write) over the
    // fast-path segments must merge cleanly
    val upd = spark.range(4, 6).select(col("id"),
      lit("b").as("part"), (col("id") * 10).as("v"))
    store.upsert("t", upd, keys = Seq("part", "id"))
    assert(store.read("t").count() == 5)
    assert(store.read("t").filter(col("part") === "b").count() == 3)
  }

  test("null partition value routes to __null like the Spark path") {
    import spark.implicits._
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "part")
    val store = new DocumentStore(spark,
      java.nio.file.Files.createTempDirectory("lp-spec3").toString)
    store.create("t", df, partitionCol = Some("part"))
    assert(store.layout("t").keySet == Set("x", "__null"))
    assert(store.read("t").count() == 2)
  }

  test("readIfExact round-trips write's encoding and rejects foreign layouts") {
    import java.sql.{Date, Timestamp}
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "i INT, l BIGINT, f FLOAT, d DOUBLE, b BOOLEAN, s STRING, t TIMESTAMP, dt DATE")
    val ts = Timestamp.valueOf("1931-02-03 04:05:06.123456") // pre-epoch micros
    val rows = Seq(
      Row(1, 10L, 1.5f, 2.5, true, "alpha", ts, Date.valueOf("2026-02-03")),
      Row(2, null, null, null, null, null, null, null))
    val conf = spark.sessionState.newHadoopConf()
    val dir = java.nio.file.Files.createTempDirectory("lp-read").toString
    val f = new org.apache.hadoop.fs.Path(dir, "a.parquet")
    LocalParquet.write(conf, f, schema, rows)
    val back = LocalParquet.readIfExact(conf, f, schema)
    assert(back.contains(rows))
    // a footer whose physical layout differs from the requested schema
    // must decline (the caller then falls back to the Spark reader)
    val narrower = org.apache.spark.sql.types.StructType.fromDDL(
      "i INT, l INT, f FLOAT, d DOUBLE, b BOOLEAN, s STRING, t TIMESTAMP, dt DATE")
    assert(LocalParquet.readIfExact(conf, f, narrower).isEmpty)
  }

  test("write accepts java.time Instant/LocalDate rows (java8API parity)") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL("t TIMESTAMP, dt DATE")
    val ins = java.time.Instant.parse("2026-02-03T04:05:06.123456Z")
    val conf = spark.sessionState.newHadoopConf()
    val dir = java.nio.file.Files.createTempDirectory("lp-java8").toString
    val f = new org.apache.hadoop.fs.Path(dir, "a.parquet")
    LocalParquet.write(conf, f, schema,
      Seq(Row(ins, java.time.LocalDate.of(2026, 2, 3))))
    val back = LocalParquet.readIfExact(conf, f, schema).get.head
    assert(back.get(0) == java.sql.Timestamp.from(ins))
    assert(back.get(1) == java.sql.Date.valueOf("2026-02-03"))
  }
}
