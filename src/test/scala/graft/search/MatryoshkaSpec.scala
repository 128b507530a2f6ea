package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t
import org.apache.spark.sql.functions._

class MatryoshkaSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("the full-dimension budget reproduces exact top-k with every flag true") {
    val e = t(spark, sf, "embeddings")
    val probe = e.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val out = Matryoshka.truncationAudit(e, "embedding", "vec_id", probe,
        k = 10, budgets = Seq(probe.length))
      .orderBy("rn").collect()
    val exact = VectorSearch.exactTopK(e, "embedding", "vec_id", probe, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == exact)
    assert(out.forall(_.getAs[Boolean]("in_full_topk")))
    out.foreach(r =>
      assert(r.getAs[Double]("trunc_sim") == r.getAs[Double]("full_sim")))
  }

  test("recall@k is monotone-ish in budget and k rows emit per budget") {
    val e = t(spark, sf, "embeddings")
    val probe = e.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val out = Matryoshka.truncationAudit(e, "embedding", "vec_id", probe,
      k = 10, budgets = Seq(8, 32, 64))
    val byBudget = out.groupBy("budget")
      .agg(count(lit(1)).as("n"),
        sum(col("in_full_topk").cast("long")).as("hits"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byBudget.values.forall(_._1 == 10L))
    assert(byBudget(64)._2 == 10L)                 // full budget: perfect recall
    assert(byBudget(8)._2 <= byBudget(64)._2)      // prefixes can only lose
  }

  test("hand-built nested vectors: an 8-dim prefix finds the prefix-near vector") {
    // v1 matches the probe on the first 8 dims exactly but diverges after;
    // v2 is closer in full space but orthogonal-ish in the prefix
    val probe = Array.tabulate(16)(i => if (i < 8) 1.0f else 1.0f)
    val v1 = Array.tabulate(16)(i => if (i < 8) 1.0f else -1.0f)
    val v2 = Array.tabulate(16)(i => if (i < 8) (if (i % 2 == 0) 1.0f else -1.0f) else 1.0f)
    val df = Seq((1L, v1.toSeq), (2L, v2.toSeq)).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = Matryoshka.truncationAudit(df, "embedding", "vec_id", probe,
        k = 1, budgets = Seq(8, 16))
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("vec_id")).toMap
    assert(out(8) == 1L)   // prefix metric prefers v1
    assert(out(16) == 2L)  // full metric prefers v2 (v1's tail cancels)
  }

  test("bad budgets fail loudly") {
    val e = t(spark, sf, "embeddings")
    val probe = e.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    intercept[IllegalArgumentException] {
      Matryoshka.truncationAudit(e, "embedding", "vec_id", probe, 10, Seq(0))
    }
    intercept[IllegalArgumentException] {
      Matryoshka.truncationAudit(e, "embedding", "vec_id", probe, 10,
        Seq(probe.length + 1))
    }
  }
}
