package graft.rag

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** [[SemanticCache]] — serve-or-admit contract: exact repeats hit at
  * sim 1, sub-threshold probes miss and then serve THEMSELVES after
  * admission, near-duplicates hit their paraphrase, and an admitted
  * miss can out-rank an earlier hit's serving entry on the second
  * pass (the freshest-cache property). */
class SemanticCacheSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("hit/miss/admit outcomes on a planted geometry") {
    // cache: two orthogonal answered questions
    val cache = Seq((100L, v(1, 0, 0, 0)), (200L, v(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val probes = Seq(
      (1L, v(1, 0, 0, 0)),          // exact repeat of 100 → sim 1
      (2L, v(0.9, 0.1, 0, 0)),      // paraphrase of 100 → high sim
      (3L, v(0, 0, 0, 1)))          // orthogonal to everything → miss
      .toDF("vec_id", "embedding")
    val out = SemanticCache.serveAndAdmit(probes, "vec_id", "embedding",
        cache, "vec_id", "embedding", threshold = 0.8)
      .collect().map(r => r.getAs[Long]("probe_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("hit"))
    assert(out(1L).getAs[Long]("served_id") == 100L)
    assert(out(1L).getAs[Double]("sim") == 1.0)
    assert(out(2L).getAs[Boolean]("hit"))
    assert(out(2L).getAs[Long]("served_id") == 100L)
    assert(!out(3L).getAs[Boolean]("hit"))
    assert(out(3L).getAs[Long]("post_served_id") == 3L) // admitted self
    // hits keep serving from the (possibly refreshed) cache, and the
    // exact repeat still resolves to its original entry post-admit
    assert(out(1L).getAs[Long]("post_served_id") == 100L)
  }

  test("lookup threshold uses the unrounded cosine; ties break by id") {
    // two cache entries IDENTICAL to the probe: tie at sim 1 → lower id
    val cache = Seq((7L, v(1, 1, 0, 0)), (5L, v(1, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val probes = Seq((1L, v(1, 1, 0, 0))).toDF("vec_id", "embedding")
    val out = SemanticCache.lookup(probes, "vec_id", "embedding",
      cache, "vec_id", "embedding", threshold = 0.5).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("served_id") == 5L)
    assert(out.head.getAs[Boolean]("hit"))
  }

  test("an admitted miss can outrank an earlier hit's serving entry") {
    // probe 1 HITS the cache entry weakly (sim ≈ 0.9285 ≥ 0.92);
    // probe 2 MISSES (sim ≈ 0.9087 < 0.92) and is admitted; probe 2's
    // vector is nearly identical to probe 1 (sim ≈ 0.9988), so probe
    // 1's post-admit pass serves from the freshly admitted entry —
    // the freshest-cache property the second REAL pass exists to test.
    val cache = Seq((100L, v(1, 0.4, 0, 0))).toDF("vec_id", "embedding")
    val probes = Seq(
      (1L, v(1, 0, 0, 0)),
      (2L, v(1, -0.05, 0, 0)))
      .toDF("vec_id", "embedding")
    val out = SemanticCache.serveAndAdmit(probes, "vec_id", "embedding",
        cache, "vec_id", "embedding", threshold = 0.92)
      .collect().map(r => r.getAs[Long]("probe_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("hit"))
    assert(out(1L).getAs[Long]("served_id") == 100L)
    assert(!out(2L).getAs[Boolean]("hit"))
    assert(out(2L).getAs[Long]("post_served_id") == 2L) // self-serve
    assert(out(1L).getAs[Long]("post_served_id") == 2L) // refreshed cache
  }

  test("an EMPTY cache misses every probe instead of dropping them") {
    // the inner knn aggregate alone yields zero rows against an empty
    // cache — the r19 review finding: the streaming cache would never
    // bootstrap. lookup must emit one miss per probe (null served_id),
    // and serveAndAdmit must then self-serve all of them.
    val cache = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val probes = Seq((1L, v(1, 0)), (2L, v(0, 1))).toDF("vec_id", "embedding")
    val lk = SemanticCache.lookup(probes, "vec_id", "embedding",
      cache, "vec_id", "embedding", threshold = 0.5).collect()
    assert(lk.length == 2)
    assert(lk.forall(!_.getAs[Boolean]("hit")))
    assert(lk.forall(_.isNullAt(lk.head.fieldIndex("served_id"))))
    val out = SemanticCache.serveAndAdmit(probes, "vec_id", "embedding",
        cache, "vec_id", "embedding", threshold = 0.5)
      .collect().map(r => r.getAs[Long]("probe_id") -> r).toMap
    assert(out.size == 2)
    assert(out.forall { case (id, r) =>
      !r.getAs[Boolean]("hit") && r.getAs[Long]("post_served_id") == id })
  }

  test("corpus end-to-end: every probe ends served, outcomes partition") {
    val e = graft.Tables.t(spark, sf, "embeddings")
    val out = SemanticCache.serveAndAdmit(
      e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
      e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", 0.38)
    val n = out.count()
    assert(n > 0)
    assert(out.filter(col("post_served_id").isNull).count() == 0)
    // misses always self-serve after admission
    assert(out.filter(!col("hit") &&
      col("post_served_id") =!= col("probe_id")).count() == 0)
    // exact members hit at sim 1 serving themselves pre-admit
    assert(out.filter(col("probe_id") % 2 === 0 &&
      col("served_id") =!= col("probe_id")).count() == 0)
  }
}
