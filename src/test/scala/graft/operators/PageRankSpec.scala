package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class PageRankSpec extends AnyFunSuite with SparkSuite {

  private val S = 1000000000000L

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame, iters: Int): Map[Long, Long] =
    PageRank.run(df, "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node cycle is an exact fixed point at uniform mass") {
    // r = S/2 each: contribution S/2, update = 0.15*S/2 + 0.85*S/2 = S/2
    val r = ranks(edges(1L -> 2L, 2L -> 1L), iters = 7)
    assert(r == Map(1L -> S / 2, 2L -> S / 2))
  }

  test("one iteration of a 3-node chain matches the hand-computed integers") {
    // 1 -> 2 -> 3 (3 is dangling). r0 = S/3 each; base = 15*S/(100*3).
    val r = ranks(edges(1L -> 2L, 2L -> 3L), iters = 1)
    val r0 = S / 3
    val base = 15L * S / (100L * 3L)
    assert(r(1L) == base) // no in-edges
    assert(r(2L) == base + 85L * (r0 / 1L) / 100L)
    assert(r(3L) == base + 85L * (r0 / 1L) / 100L)
  }

  test("star graph concentrates rank on the hub; total mass is bounded by scale") {
    // spokes all point at the hub, hub points back at every spoke
    val spokes = (2L to 6L)
    val e = edges(spokes.map(_ -> 1L) ++ spokes.map(1L -> _): _*)
    val r = ranks(e, iters = 10)
    val hub = r(1L)
    assert(spokes.forall(s => r(s) < hub))
    assert(spokes.map(r).distinct.size == 1) // symmetric spokes tie exactly
    val total = r.values.sum
    assert(total <= S && total > S - 100) // only integer truncation loss
  }

  test("duplicate edges collapse: parallel edges do not double-count") {
    val once = ranks(edges(1L -> 2L, 2L -> 1L), iters = 3)
    val dup = ranks(edges(1L -> 2L, 1L -> 2L, 2L -> 1L), iters = 3)
    assert(once == dup)
  }

  test("result is invariant to input partitioning") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L)
    assert(ranks(e, 4) == ranks(e.repartition(7), 4))
  }

  /** Unrolled integer replay of the redistribution variant — the same
    * arithmetic [[PageRank.oracleCtes]] emits with redistribute=true. */
  private def replayRedistribute(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = es.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    val base = 15L * S / (100L * n)
    var r = nodes.map(_ -> S / n).toMap
    (1 to iters).foreach { _ =>
      val sink = nodes.filterNot(outdeg.contains).map(r).sum / n
      r = nodes.map { v =>
        val in = e.filter(_._2 == v).map { case (u, _) => r(u) / outdeg(u) }.sum
        v -> (base + 85L * (in + sink) / 100L)
      }.toMap
    }
    r
  }

  test("dangling-node graph: redistribution matches the unrolled oracle " +
    "and conserves mass where the default leaks it") {
    // 1 -> 2 -> 3, 1 -> 3: node 3 is dangling and rank-heavy
    val es = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
    val got = PageRank.run(edges(es: _*), "src", "dst", iterations = 4,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == replayRedistribute(es, 4))
    // mass conservation: redistribution keeps the total within integer
    // truncation of scale; the default variant leaks the damped sink mass
    val totalRedis = got.values.sum
    assert(totalRedis <= S && totalRedis > S - 100)
    val totalLeaky = ranks(edges(es: _*), 4).values.sum
    assert(totalLeaky < totalRedis - S / 100) // visibly less mass
  }

  test("L1 tolerance stops early: a fixed point stops after one iteration") {
    // two-node cycle at uniform mass never moves → delta 0 ≤ any tol>0
    val e = edges(1L -> 2L, 2L -> 1L)
    val tol = PageRank.run(e, "src", "dst", iterations = 50, toleranceMicro = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tol == Map(1L -> S / 2, 2L -> S / 2))
    // and on a moving trajectory the rule stops at the SAME integer table
    // a fixed-iteration run reaches once its step delta is under tol
    val chain = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L)
    val bounded = PageRank.run(chain, "src", "dst", iterations = 60,
        toleranceMicro = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exhaustive = ranks(chain, 60)
    // converged-by-tolerance trajectory must agree with the exhaustive
    // fixpoint to within the tolerance on every node
    assert(bounded.forall { case (k, v) => math.abs(v - exhaustive(k)) <= 1000L })
  }

  private def wedges(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst", "w")
  }

  test("constant weight 1 is bit-identical to the unweighted form") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L)
    val un = ranks(e, 6)
    val w1 = PageRank.run(wedges(e.collect().map(r =>
        (r.getLong(0), r.getLong(1), 1L)).toIndexedSeq: _*),
      "src", "dst", 6, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1 == un)
  }

  test("weighted one step splits mass proportionally to edge weight") {
    // 1 -> 2 (w=3), 1 -> 3 (w=1); r0 = S/3 each, wsum(1) = 4
    val r = PageRank.run(wedges((1L, 2L, 3L), (1L, 3L, 1L)), "src", "dst", 1,
        weightCol = Some("w"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val r0 = S / 3
    val base = 15L * S / (100L * 3L)
    assert(r(2L) == base + 85L * (r0 * 3L / 4L) / 100L)
    assert(r(3L) == base + 85L * (r0 * 1L / 4L) / 100L)
    assert(r(1L) == base)
  }

  test("duplicate weighted edges sum; non-positive weights fail loudly") {
    val a = PageRank.run(wedges((1L, 2L, 2L), (1L, 2L, 3L), (1L, 3L, 5L)),
        "src", "dst", 3, weightCol = Some("w"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = PageRank.run(wedges((1L, 2L, 5L), (1L, 3L, 5L)),
        "src", "dst", 3, weightCol = Some("w"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(a == b)
    intercept[Exception] {
      PageRank.run(wedges((1L, 2L, 0L)), "src", "dst", 1,
        weightCol = Some("w")).collect()
    }
  }

  private def seedDf(ns: Long*) = {
    import spark.implicits._
    ns.toDF("node")
  }

  private def pranks(df: org.apache.spark.sql.DataFrame, iters: Int,
                     seeds: Seq[Long]): Map[Long, Long] =
    PageRank.run(df, "src", "dst", iters, seeds = Some(seedDf(seeds: _*)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("personalized: mass stays in the seed's component; unreachable nodes are 0") {
    // two disconnected pairs; seeding {1} must leave {3,4} at exactly 0
    val e = edges(1L -> 2L, 3L -> 4L)
    val r = pranks(e, iters = 5, seeds = Seq(1L))
    assert(r(3L) == 0L && r(4L) == 0L)
    assert(r(1L) > 0L && r(2L) > 0L)
    // seed gets the full teleport base; 2 only the damped flow
    assert(r(1L) == 15L * S / 100L)
  }

  test("personalized one step matches the hand-computed integers") {
    // 1 -> 2 -> 3, seed {1}: r0 = (S, 0, 0)
    val r = pranks(edges(1L -> 2L, 2L -> 3L), iters = 1, seeds = Seq(1L))
    val base = 15L * S / 100L
    assert(r(1L) == base)                  // teleport only
    assert(r(2L) == 85L * (S / 1L) / 100L) // flow from the seed, no base
    assert(r(3L) == 0L)                    // two hops away after one step
  }

  test("seeding every node is bit-identical to uniform PageRank") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L)
    val uniform = ranks(e, 6)
    val allSeeds = pranks(e, 6, seeds = Seq(1L, 2L, 3L))
    assert(allSeeds == uniform)
  }

  test("seeds outside the graph are ignored; no in-graph seed fails loudly") {
    val e = edges(1L -> 2L)
    val r = pranks(e, iters = 2, seeds = Seq(1L, 99L))
    assert(r(1L) == 15L * S / 100L) // denominator is 1, not 2
    intercept[IllegalArgumentException] {
      pranks(e, iters = 1, seeds = Seq(42L))
    }
  }

  test("personalized + dangling redistribution restarts the walker at the seeds") {
    // 1 -> 2 (2 dangling), seed {1}: without redistribution node 1 keeps
    // only its base after step 1; with it, 2's mass returns to the seed
    val e = edges(1L -> 2L)
    val leak = PageRank.run(e, "src", "dst", 2, seeds = Some(seedDf(1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val conserve = PageRank.run(e, "src", "dst", 2,
        redistributeDangling = true, seeds = Some(seedDf(1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conserve(1L) > leak(1L), "dangling mass did not return to the seed")
    // replay step 2 exactly: r1 = (base, 85*S/100); sink share = r1(2)
    val base = 15L * S / 100L
    val r12 = 85L * S / 100L
    assert(conserve(1L) == base + 85L * r12 / 100L)
    assert(conserve(2L) == 85L * (base / 1L) / 100L)
  }
}
