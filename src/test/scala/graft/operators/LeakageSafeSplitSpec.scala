package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** The q434 contract as an operator-level proof: hashing the split on
  * the near-dup CLUSTER id keeps every duplicate pair on one side of
  * the fence, while the naive per-doc hash demonstrably leaks planted
  * twins across splits. */
class LeakageSafeSplitSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val twin =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3

  test("planted twins: naive split leaks, cluster-hashed split cannot") {
    // Knuth buckets: b(1)=61 (train), b(3)=87 (val) — ids chosen so the
    // naive hash puts identical docs on opposite sides
    val docs = Seq(
      (1L, twin), (3L, twin),
      (10L, "unrelated words one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.8, hashShingles = true)
    val cl = Clusters.connectedComponents(docs, "doc_id", pairs, "a_id", "b_id")
    val naive = Splits.withSplit(docs.select(col("doc_id")), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val safe = Splits.withSplit(cl, "cluster_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(naive(1L) != naive(3L), "planted twins must straddle the naive split")
    assert(safe(1L) == safe(3L))
  }

  test("corpus invariant: no >=0.8-Jaccard pair straddles the safe split") {
    val docs = graft.Tables.t(spark, sf, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.8, hashShingles = true)
    val cl = Clusters.connectedComponents(docs, "doc_id", pairs, "a_id", "b_id")
    val safe = Splits.withSplit(cl, "cluster_id")
      .select(col("doc_id"), col("split"))
    val straddling = pairs
      .join(safe.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("split", "sa"), Seq("a_id"))
      .join(safe.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("split", "sb"), Seq("b_id"))
      .filter(col("sa") =!= col("sb")).count()
    assert(straddling == 0L)
    // and the split is still a partition of the corpus
    assert(safe.count() == docs.count())
  }
}
