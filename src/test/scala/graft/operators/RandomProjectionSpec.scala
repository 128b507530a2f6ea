package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class RandomProjectionSpec extends AnyFunSuite with SparkSuite {

  test("JL property: pairwise distances preserved within tolerance on real embeddings") {
    val e = t(spark, sf, "embeddings").limit(40).cache()
    val p = RandomProjection.projectFloat(e, "embedding", inDims = 64, outDims = 16)
      .select(col("vec_id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val orig = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted
    val ratios = for {
      i <- ids.indices; k <- (i + 1) until ids.length
      o = d2(orig(ids(i)), orig(ids(k))) if o > 1e-9
    } yield d2(p(ids(i)), p(ids(k))) / o
    // JL with k=16: distortion ~ 1/sqrt(16); median must be near 1,
    // bulk within a generous band
    val sorted = ratios.sorted
    val median = sorted(sorted.length / 2)
    assert(math.abs(median - 1.0) < 0.35, s"median distortion $median")
    val within = ratios.count(r => r > 0.3 && r < 2.2).toDouble / ratios.length
    assert(within > 0.95, s"only ${within * 100}%% of pairs within band")
  }

  test("grid face is deterministic and partitioning-invariant") {
    val e = t(spark, sf, "embeddings").limit(50)
    def run(df: org.apache.spark.sql.DataFrame) =
      RandomProjection.projectGrid(df, "embedding", 64, 16)
        .select(col("vec_id"), col("proj")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(run(e) == run(e.repartition(13)))
  }

  test("different seeds give different projections (seams for ensembles)") {
    val e = t(spark, sf, "embeddings").limit(5)
    val a = RandomProjection.projectGrid(e, "embedding", 64, 16, seed = 7)
      .select("proj").collect().map(_.getSeq[Long](0)).toSeq
    val b = RandomProjection.projectGrid(e, "embedding", 64, 16, seed = 8)
      .select("proj").collect().map(_.getSeq[Long](0)).toSeq
    assert(a != b)
  }

  test("no UDFs: projection stays in codegen") {
    val plan = RandomProjection.projectGrid(
        t(spark, sf, "embeddings"), "embedding", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }
}
