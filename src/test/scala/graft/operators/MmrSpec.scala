package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class MmrSpec extends AnyFunSuite with SparkSuite {

  // three unit-norm clusters with angular spread (the geometry of real
  // embeddings — MMR's diversity term only beats a near-duplicate's
  // relevance when redundancy ≈ self-similarity, i.e. normalized
  // vectors); cluster 0 is most query-similar
  private def corpus = {
    import spark.implicits._
    val probe = Array(1.0f, 0.0f, 0.0f, 0.0f)
    def jit(i: Int) = i * 0.0005f
    val rows =
      (0 until 4).map(i => (i.toLong, Array(0.99f, 0.141f, 0f, jit(i)))) ++
      (10 until 14).map(i => (i.toLong, Array(0.5f, -0.866f, 0f, jit(i - 10)))) ++
      (20 until 24).map(i => (i.toLong, Array(0.5f, 0f, -0.866f, jit(i - 20))))
    (rows.toDF("vec_id", "embedding"), probe)
  }

  test("plain top-k drowns in the dominant cluster; MMR spreads across clusters") {
    val (df, probe) = corpus
    val mmr = Mmr.diversifiedTopK(df, "vec_id", "embedding", probe,
      k = 3, shortlist = 12)
    val picked = mmr.orderBy("rnk").collect().map(_.getLong(1)).toSeq
    val clusters = picked.map(_ / 10).toSet
    assert(clusters == Set(0L, 1L, 2L), s"picked $picked")
    // plain top-3 by similarity would be all cluster 0
    assert(picked.head < 4, "first pick must be the most relevant")
  }

  test("first pick is always the plain argmax (MMR never sacrifices the top hit)") {
    val (df, probe) = corpus
    val first = Mmr.diversifiedTopK(df, "vec_id", "embedding", probe, 5, 12)
      .filter(col("rnk") === 1).head().getLong(1)
    assert(first == 0L)
  }

  test("deterministic under repartitioning") {
    val (df, probe) = corpus
    val a = Mmr.diversifiedTopK(df, "vec_id", "embedding", probe, 5, 12)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val b = Mmr.diversifiedTopK(df.repartition(7), "vec_id", "embedding", probe, 5, 12)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("k beyond the shortlist truncates to the shortlist") {
    val (df, probe) = corpus
    val out = Mmr.diversifiedTopK(df, "vec_id", "embedding", probe, k = 50, shortlist = 50)
    assert(out.count() == 12) // corpus size
  }
}
