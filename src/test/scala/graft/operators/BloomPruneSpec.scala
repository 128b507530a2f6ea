package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class BloomPruneSpec extends AnyFunSuite with SparkSuite {

  test("no false negatives: every dim key survives the prune") {
    val orders = t(spark, sf, "orders")
    val dim = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bf = BloomPrune.build(dim, "o_orderkey", 1000, fpp = 0.05)
    val li = t(spark, sf, "lineitem")
    val pruned = li.filter(BloomPrune.mightContain(bf, col("l_orderkey")))
    val trueMatches = li.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    val afterExact = pruned.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(afterExact == trueMatches)
  }

  test("the prune actually cuts rows (and fpp bounds the leak)") {
    val dim = t(spark, sf, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bf = BloomPrune.build(dim, "o_orderkey", math.max(64, dim.count()), fpp = 0.01)
    val li = t(spark, sf, "lineitem")
    val total = li.count()
    val kept = li.filter(BloomPrune.mightContain(bf, col("l_orderkey"))).count()
    val trueMatches = li.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(kept < total, "prune removed nothing")
    // kept = matches + false positives; allow generous 5x fpp slack
    assert(kept - trueMatches <= (total * 0.05).toLong,
      s"kept=$kept matches=$trueMatches total=$total")
  }

  test("prunedJoin equals the plain join") {
    val dim = t(spark, sf, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = t(spark, sf, "lineitem")
    val got = BloomPrune.prunedJoin(li, dim, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber")).orderBy("l_orderkey", "l_linenumber")
    val want = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber")).orderBy("l_orderkey", "l_linenumber")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("probe is the codegen kernel, not a UDF") {
    val dim = t(spark, sf, "orders").limit(100).select(col("o_orderkey"))
    val bf = BloomPrune.build(dim, "o_orderkey", 100)
    val plan = t(spark, sf, "lineitem")
      .filter(BloomPrune.mightContain(bf, col("l_orderkey")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(500))
    assert(!plan.contains("ScalaUDF"))
  }
}
