package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.search.InvertedIndex
import graft.store.DocumentStore

class IndexIngestSpec extends AnyFunSuite with SparkSuite {

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def indexEquals(dirA: String, dirB: String): Boolean = {
    val a = new DocumentStore(spark, dirA)
    val b = new DocumentStore(spark, dirB)
    Seq("postings", "docmap", "meta").forall { t =>
      val x = a.read(t); val y = b.read(t)
      x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
    }
  }

  test("micro-batched changes converge to the full rebuild, batch boundaries anywhere") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-iis").toString
    InvertedIndex.build(corpus((1L, "alpha beta"), (2L, "beta gamma"),
      (3L, "gamma delta")), "doc_id", "text", dir)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val qy = IndexIngest.start(
      mem.toDF().toDF("change", "doc_id", "text"), dir,
      "doc_id", "text", "change",
      Files.createTempDirectory("graft-iis-ckpt").toString)
    try {
      mem.addData(("delete", 2L, ""), ("update", 1L, "alpha beta epsilon"))
      qy.processAllAvailable()
      mem.addData(("insert", 9L, "epsilon zeta"))
      qy.processAllAvailable()
    } finally qy.stop()
    val dir2 = Files.createTempDirectory("graft-iis-rebuild").toString
    InvertedIndex.build(corpus((1L, "alpha beta epsilon"), (3L, "gamma delta"),
      (9L, "epsilon zeta")), "doc_id", "text", dir2)
    assert(indexEquals(dir, dir2))
    // the post-stream term is immediately searchable
    val hits = InvertedIndex.search(spark, dir, Seq("epsilon"), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 9L))
  }

  test("replayed batch is idempotent: re-applying the same delta changes nothing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-iis-r").toString
    InvertedIndex.build(corpus((1L, "a b"), (2L, "b c")), "doc_id", "text", dir)
    val delta = corpus((2L, "b c d"), (5L, "d e"))
    InvertedIndex.add(spark, dir, delta, "doc_id", "text")
    val snap = Files.createTempDirectory("graft-iis-snap").toString
    InvertedIndex.build(corpus((1L, "a b"), (2L, "b c d"), (5L, "d e")),
      "doc_id", "text", snap)
    assert(indexEquals(dir, snap))
    // crash-replay: the sink re-applies the SAME batch — state unchanged
    InvertedIndex.add(spark, dir, delta, "doc_id", "text")
    InvertedIndex.remove(spark, dir, Seq(999L)) // absent id: no-op
    assert(indexEquals(dir, snap))
  }

  test("oversized trigger takes the distributed path and still converges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-iis-big").toString
    InvertedIndex.build(corpus((1L, "alpha beta"), (2L, "beta gamma"),
      (3L, "gamma delta"), (4L, "delta rho")), "doc_id", "text", dir)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    // threshold far below the batch size: the sink must refuse the id
    // collect and route the whole trigger through applyChangesDistributed
    spark.conf.set("spark.graft.index.maxTriggerCollect", "2")
    val qy = IndexIngest.start(
      mem.toDF().toDF("change", "doc_id", "text"), dir,
      "doc_id", "text", "change",
      Files.createTempDirectory("graft-iis-big-ckpt").toString)
    try {
      mem.addData(("delete", 2L, ""), ("update", 1L, "alpha beta epsilon"),
        ("insert", 9L, "epsilon zeta"), ("insert", 10L, "zeta iota"),
        ("insert", 11L, "iota kappa"), ("delete", 4L, ""))
      qy.processAllAvailable()
    } finally {
      qy.stop()
      spark.conf.unset("spark.graft.index.maxTriggerCollect")
    }
    val dir2 = Files.createTempDirectory("graft-iis-big-rebuild").toString
    InvertedIndex.build(corpus((1L, "alpha beta epsilon"), (3L, "gamma delta"),
      (9L, "epsilon zeta"), (10L, "zeta iota"), (11L, "iota kappa")),
      "doc_id", "text", dir2,
      buckets = InvertedIndex.layoutBuckets(spark, dir))
    assert(indexEquals(dir, dir2))
    val hits = InvertedIndex.search(spark, dir, Seq("iota"), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(10L, 11L))
  }

  test("pure-insert oversized trigger appends through the distributed path") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-iis-bi").toString
    InvertedIndex.build(corpus((1L, "alpha beta"), (2L, "beta gamma")),
      "doc_id", "text", dir)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    spark.conf.set("spark.graft.index.maxTriggerCollect", "1")
    val qy = IndexIngest.start(
      mem.toDF().toDF("change", "doc_id", "text"), dir,
      "doc_id", "text", "change",
      Files.createTempDirectory("graft-iis-bi-ckpt").toString)
    try {
      mem.addData(("insert", 7L, "mu nu"), ("insert", 8L, "nu xi"),
        ("insert", 9L, "xi omicron"))
      qy.processAllAvailable()
    } finally {
      qy.stop()
      spark.conf.unset("spark.graft.index.maxTriggerCollect")
    }
    val dir2 = Files.createTempDirectory("graft-iis-bi-rebuild").toString
    InvertedIndex.build(corpus((1L, "alpha beta"), (2L, "beta gamma"),
      (7L, "mu nu"), (8L, "nu xi"), (9L, "xi omicron")),
      "doc_id", "text", dir2,
      buckets = InvertedIndex.layoutBuckets(spark, dir))
    assert(indexEquals(dir, dir2))
  }

  test("in-batch delete+reinsert of one key lands as the reinsert (last wins)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-iis-lw").toString
    InvertedIndex.build(corpus((1L, "a b"), (2L, "b c")), "doc_id", "text", dir)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, String, Long)]
    val qy = IndexIngest.start(
      mem.toDF().toDF("change", "doc_id", "text", "v"), dir,
      "doc_id", "text", "change",
      Files.createTempDirectory("graft-iis-lw-ckpt").toString,
      versionCol = Some("v"))
    try {
      mem.addData(("delete", 2L, "", 1L), ("insert", 2L, "b c reborn", 2L))
      qy.processAllAvailable()
    } finally qy.stop()
    val hits = InvertedIndex.search(spark, dir, Seq("reborn"), k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(2L))
  }
}
