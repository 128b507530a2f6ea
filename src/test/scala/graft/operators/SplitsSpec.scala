package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class SplitsSpec extends AnyFunSuite with SparkSuite {

  test("split is stable under repartitioning (randomSplit is not)") {
    val docs = t(spark, sf, "documents")
    def assignment(df: org.apache.spark.sql.DataFrame) =
      Splits.withSplit(df, "doc_id").select("doc_id", "split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assignment(docs)
    val b = assignment(docs.repartition(17, col("source")))
    assert(a == b)
  }

  test("fractions land within grid tolerance and every row is assigned") {
    val out = Splits.withSplit(t(spark, sf, "documents"), "doc_id")
    assert(out.filter(col("split").isNull).count() == 0)
    val n = out.count().toDouble
    val byName = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byName("train") / n - 0.8) < 0.1)
    assert(byName.keySet == Set("train", "val", "test"))
  }

  test("splits are disjoint and exhaustive by construction") {
    val out = Splits.withSplit(t(spark, sf, "documents"), "doc_id")
    assert(out.select("doc_id").distinct().count() == out.count())
  }
}
