package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class ItemsetsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("hand-computed support, confidence, lift") {
    // baskets: {a,b,c} {a,b} {a,c} {b,c} {a} -> N=5
    // c(a)=4 c(b)=3 c(c)=3; c(ab)=2 c(ac)=2 c(bc)=2
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b"), (4L, "c"),
      (5L, "a"))
    val m = Itemsets.frequentPairs(rows.toDF("o", "i"), "o", "i", minSupport = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(m(("a", "b")) == ((2L, 4L, 3L, 0.5, 2.0 * 5 / 12)))
    assert(m(("a", "c")) == ((2L, 4L, 3L, 0.5, 2.0 * 5 / 12)))
    assert(m(("b", "c")) == ((2L, 3L, 3L, 2.0 / 3, 2.0 * 5 / 9)))
    assert(m.size == 3)
  }

  test("duplicate (basket, item) rows collapse before counting") {
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
    val m = Itemsets.frequentPairs(rows.toDF("o", "i"), "o", "i", 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("a", "b")) == 2L)
  }

  test("minSupport prunes; maxItemDf drops hot items with loud accounting") {
    // "hot" appears in every basket and would dominate the pair space
    val rows = (1L to 10L).flatMap(o => Seq((o, "hot"), (o, s"i${o % 3}")))
    val all = Itemsets.frequentPairs(rows.toDF("o", "i"), "o", "i", 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(all.exists(_._2 == "hot") || all.exists(_._1 == "hot"))
    val capped = Itemsets.frequentPairs(rows.toDF("o", "i"), "o", "i", 2L,
      maxItemDf = Some(5L))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!capped.exists(p => p._1 == "hot" || p._2 == "hot"))
    val hot = Itemsets.hotItems(rows.toDF("o", "i"), "o", "i", 5L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hot == Map("hot" -> 10L))
  }

  test("capped output is identical to semi-join-by-kept-items semantics") {
    // the broadcast-direction flip (anti-join vs tiny hot set instead of
    // semi-join vs near-whole kept vocab) must not change a single row
    val rows = (1L to 20L).flatMap(o =>
      Seq((o, "hot1"), (o, "hot2"), (o, s"i${o % 4}"), (o, s"j${o % 3}")))
    val df = rows.toDF("o", "i")
    val capped = Itemsets.frequentPairs(df, "o", "i", 2L, maxItemDf = Some(10L))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // reference semantics: filter kept items first, then uncapped pairs
    import org.apache.spark.sql.functions._
    val keptItems = df.distinct().groupBy($"i").count()
      .filter($"count" <= 10L).select($"i")
    val ref = Itemsets.frequentPairs(df.join(keptItems, Seq("i"), "left_semi"),
      "o", "i", 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(capped == ref)
    assert(!capped.keys.exists(p => p._1.startsWith("hot") || p._2.startsWith("hot")))
  }

  test("the broadcast side under a cap is the HOT set, not the kept vocabulary") {
    // 100-item vocab, one hot item: the plan must broadcast-anti-join
    // against the 1-row hot set — a kept-vocab broadcast ODs the driver
    // at web-scale vocabularies
    val rows = (1L to 100L).flatMap(o => Seq((o, "hot"), (o, s"i$o")))
    val out = Itemsets.frequentPairs(rows.toDF("o", "i"), "o", "i", 1L,
      maxItemDf = Some(50L))
    val plan = out.queryExecution.executedPlan.toString
    // the anti join must be broadcast (hot side small by construction)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast LeftAnti against the hot set, got:\n$plan")
  }

  test("matches brute-force on lineitem baskets, any partitioning") {
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select($"l_orderkey".as("o"), $"l_partkey".as("i")).limit(2000)
    val rows = li.collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byO = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val expect = byO.values.toSeq.flatMap(is =>
      for (a <- is; b <- is if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    val got = Itemsets.frequentPairs(li.repartition(7), "o", "i", 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect)
  }
}
