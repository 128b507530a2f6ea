package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class PoolingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("meanPool equals the hand-computed per-group elementwise mean") {
    val df = Seq(
      ("a", Seq(1f, 2f, 3f)),
      ("a", Seq(3f, 4f, 5f)),
      ("b", Seq(10f, 0f, -2f))).toDF("g", "v")
    val out = Pooling.meanPool(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> (r.getSeq[Double](2), r.getLong(1))).toMap
    assert(out("a")._1 == Seq(2.0, 3.0, 4.0) && out("a")._2 == 2L)
    assert(out("b")._1 == Seq(10.0, 0.0, -2.0) && out("b")._2 == 1L)
  }

  test("meanPool is partitioning-invariant on real embeddings") {
    val e = t(spark, sf, "embeddings").select($"label", $"embedding")
    def pool(df: org.apache.spark.sql.DataFrame) =
      Pooling.meanPool(df, Seq("label"), "embedding")
        .select($"label", transform($"pooled", x => round(x, 6)).as("p"), $"n")
        .orderBy($"label")
        .collect().map(r => (r.get(0), r.getSeq[Double](1), r.getLong(2))).toSeq
    assert(pool(e.repartition(1)) == pool(e.repartition(13, $"label")))
  }

  test("sumPoolLong is exact and matches a driver-side recount") {
    val e = t(spark, sf, "embeddings")
      .select($"label",
        transform($"embedding", x => floor(x.cast("double") * lit(1048576)).cast("long")).as("q"))
    val got = Pooling.sumPoolLong(e, Seq("label"), "q")
      .collect().map(r => r.get(0) -> (r.getSeq[Long](2), r.getLong(1))).toMap
    val local = e.collect().map(r => (r.get(0), r.getSeq[Long](1)))
      .groupBy(_._1).map { case (label, rows) =>
        val dims = rows.head._2.length
        val sums = new Array[Long](dims)
        rows.foreach { case (_, v) =>
          var i = 0; while (i < dims) { sums(i) += v(i); i += 1 }
        }
        label -> (sums.toSeq, rows.length.toLong)
      }
    assert(got == local)
  }

  test("pooling plans as a partial aggregate, not an element-row shuffle") {
    val e = t(spark, sf, "embeddings").select($"label", $"embedding")
    val plan = Pooling.meanPool(e, Seq("label"), "embedding")
      .queryExecution.executedPlan.toString
    // two-phase ObjectHashAggregate around the exchange; no Generate
    // (posexplode) below it — the corpus is never exploded to rows
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Generate"), plan)
  }
}
