package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class HubnessSpec extends AnyFunSuite with SparkSuite {

  test("hand-computed k-occurrence with deterministic tie order") {
    import spark.implicits._
    // a=(1,0), b=(1,0), c=(0,1): k=1 lists: a->b, b->a, c->a (tie by id)
    val rows = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(0f, 1f))).toDF("id", "v")
    val out = Hubness.kOccurrence(rows, "id", "v", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // occurrences: id1 twice, id2 once, id3 never
    assert(out == Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }

  test("mean occurrence is exactly k; skew detects a hub") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 40 scattered points + one central hub direction
    val rows = (1L to 40L).map { i =>
      val base = Array.fill(8)(rnd.nextGaussian().toFloat)
      (i, base)
    }
    val r = Hubness.kOccurrence(rows.toDF("id", "v"), "id", "v", k = 3)
      .head()
    assert(r.getAs[Double]("mean_occ") == 3.0, "E[N_k] = k identity")
    assert(r.getAs[Long]("n") == 40L && r.getAs[Long]("k") == 3L)
  }

  test("degenerate inputs fail loudly") {
    import spark.implicits._
    val rows = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)))
      .toDF("id", "v")
    intercept[IllegalArgumentException] {
      Hubness.kOccurrence(rows, "id", "v", k = 5)
    }
  }

  test("ANN-candidate path at exhaustive nprobe equals the exact form") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (1L to 60L).map(i => (i, Array.fill(6)(rnd.nextGaussian()
      .toFloat))).toDF("id", "v")
    val exact = Hubness.kOccurrence(rows, "id", "v", k = 3)
      .collect().map(_.toString).sorted.toSeq
    val idx = graft.search.IvfIndex.train(rows, "v", "id", numLists = 4)
    val cand = idx.searchMany(idx.assign(rows, "v"), "v", "id",
      rows.select($"id".as("pid"), $"v".as("pvec")), "pid", "pvec",
      k = 4, nprobe = 4) // k+1: the self-hit is dropped downstream
    val viaAnn = Hubness.kOccurrenceFromCandidates(rows, "id",
      cand, "probe_id", "id", "sim", k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(viaAnn == exact)
  }

  test("candidate path never builds the n² join (cost tracks candidates)") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, Array.fill(4)(i.toFloat % 7 + 1)))
      .toDF("id", "v")
    val idx = graft.search.IvfIndex.train(rows, "v", "id", numLists = 4)
    val cand = idx.searchMany(idx.assign(rows, "v"), "v", "id",
      rows.select($"id".as("pid"), $"v".as("pvec")), "pid", "pvec",
      k = 3, nprobe = 2)
    val out = Hubness.kOccurrenceFromCandidates(rows, "id",
      cand, "probe_id", "id", "sim", k = 2)
    val plan = out.queryExecution.executedPlan.toString
    // the exact form's all-pairs cosine is a nested-loop join; the
    // candidate form must be equi-joins only, end to end
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"candidate path fell back to an all-pairs join:\n$plan")
    // partial nprobe still yields a well-formed audit (E[N_k] <= k —
    // truncated lists can only lose occurrences)
    val r = out.head()
    assert(r.getAs[Double]("mean_occ") <= 2.0 + 1e-9)
  }
}
