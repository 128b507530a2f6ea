package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class LinkageSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  private def bk = {
    val words = split(col("s"), " ")
    concat_ws("|", element_at(words, 1), size(words).cast("string"))
  }

  test("blocking bounds candidates; verify keeps only close pairs") {
    val df = Seq(
      (1L, "alpha beta"), (2L, "alpha betz"), (3L, "alpha gamma"),
      (4L, "beta alpha"), (5L, "zeta")).toDF("id", "s")
    val pairs = Linkage.blockedPairs(df, "id", "s", bk, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // block "alpha|2" = {1,2,3}: only (1,2) survives dist<=2;
    // (1,3)/(2,3) are candidates but distance 4; 4 and 5 block alone
    assert(pairs == Set((1L, 2L, 1)))
  }

  test("bestMatch: per-record face with deterministic smallest-id tie-break") {
    val df = Seq(
      (1L, "alpha beta"), (2L, "alpha betz"), (3L, "alpha betx"),
      (9L, "solo one")).toDF("id", "s")
    val m = Linkage.bestMatch(df, "id", "s", bk, maxDist = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    // 1's matches: 2 and 3 both at dist 1 -> smallest id (2) wins
    assert(m(1L) == ((2L, 2L, 1L, 2L)))
    assert(m(2L)._3 == 1L)
    // solo block: zero candidates, NULL best
    assert(m(9L) == ((0L, 0L, -1L, -1L)))
  }

  test("threshold levenshtein: beyond-band candidates counted in n_block, not n_match") {
    val df = Seq((1L, "aaaa xx"), (2L, "bbbb xx")).toDF("id", "s")
    // same token count but first tokens differ -> different blocks: no candidates
    val m0 = Linkage.bestMatch(df, "id", "s", bk, maxDist = 2).collect()
    assert(m0.forall(_.getLong(1) == 0L))
    // force one block: distance 4 > band -> candidate but no match
    val one = Linkage.bestMatch(df, "id", "s", lit("k"), maxDist = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(one(1L) == ((1L, 0L)) && one(2L) == ((1L, 0L)))
  }

  test("bestMatch fails loudly when an id exceeds the encoding span") {
    val df = Seq((1L, "aa"), (20000000L, "ab")).toDF("id", "s")
    val e = intercept[Exception] {
      Linkage.bestMatch(df, "id", "s", lit("k"), maxDist = 2).collect()
    }
    assert(e.getMessage.contains("id out of") ||
      Option(e.getCause).exists(_.getMessage.contains("id out of")))
  }

  test("entity resolution composition: pairs -> CC -> canonical groups") {
    // "acme corp" ~ "acme corq" ~ "acme corr" chain into ONE entity via
    // dist-1 links even though the endpoints are 2 apart; "zeta x" alone
    val df = Seq(
      (10L, "acme corp"), (11L, "acme corq"), (12L, "acme corr"),
      (20L, "zeta x")).toDF("id", "s")
    val pairs = Linkage.blockedPairs(df, "id", "s", bk, maxDist = 1)
    val cc = Clusters.connectedComponents(df, "id", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(10L) == 10L && cc(11L) == 10L && cc(12L) == 10L)
    assert(cc(20L) == 20L)
  }

  test("matches brute-force within-block pairs on part names, any partitioning") {
    val part = graft.Tables.t(spark, sf, "part")
      .select(col("p_partkey").as("id"), col("p_name").as("s")).limit(400)
    val rows = part.collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def key(s: String) = { val w = s.split(" "); s"${w.head}|${w.length}" }
    val expect = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && key(sa) == key(sb) && lev(sa, sb) <= 2
    } yield (ia, ib, lev(sa, sb))).toSet
    val got = Linkage.blockedPairs(part.repartition(7), "id", "s", bk, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect && expect.nonEmpty)
  }
}
