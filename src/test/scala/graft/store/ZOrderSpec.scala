package graft.store

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class ZOrderSpec extends AnyFunSuite with SparkSuite {

  test("zval is the exact Morton interleave of the two ranks") {
    import spark.implicits._
    // corners of the value space: rank 0 and rank 65535 each axis
    val df = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)).toDF("a", "b")
    val z = ZOrder.withZBucket(df, "a", "b", log2Buckets = 2)
      .select("a", "b", "zval").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(z((0.0, 0.0)) == 0L)
    assert(z((1.0, 0.0)) == 0x55555555L)         // all even bits
    assert(z((0.0, 1.0)) == 0xAAAAAAAAL)         // all odd bits
    assert(z((1.0, 1.0)) == 0xFFFFFFFFL)
  }

  test("z-order layout prunes on BOTH columns; linear layout only on its own") {
    val orders = t(spark, sf, "orders")
    val store = new DocumentStore(spark, Files.createTempDirectory("graft-zo").toString)
    val z = ZOrder.withZBucket(orders, "o_custkey", "o_totalprice", log2Buckets = 4)
    store.create("oz", z, partitionCol = Some("zbucket"))
    store.analyze("oz", Seq("o_custkey", "o_totalprice"))
    val (kc, tc) = store.statsPrunedParts("oz", "o_custkey", 10L, 80L)
    val (kp, tp) = store.statsPrunedParts("oz", "o_totalprice", 1000.0, 20000.0)
    assert(kc.size < tc, s"custkey pruned nothing (${kc.size}/$tc)")
    assert(kp.size < tp, s"totalprice pruned nothing (${kp.size}/$tp)")

    // the q105-style single-column layout cannot prune the OTHER column
    val width = math.max(100L, orders.agg(max(col("o_custkey"))).head().getLong(0) / 10)
    val linear = orders.withColumn("ck_bucket",
      floor(col("o_custkey") / width).cast("long"))
    store.create("olin", linear, partitionCol = Some("ck_bucket"))
    store.analyze("olin", Seq("o_totalprice"))
    val (kl, tl) = store.statsPrunedParts("olin", "o_totalprice", 1000.0, 20000.0)
    assert(kl.size == tl, "linear layout unexpectedly pruned the unclustered column")
  }

  test("readWhere over the z-layout returns exactly the filtered rows") {
    val orders = t(spark, sf, "orders")
    val store = new DocumentStore(spark, Files.createTempDirectory("graft-zo2").toString)
    store.create("oz",
      ZOrder.withZBucket(orders, "o_custkey", "o_totalprice", 4),
      partitionCol = Some("zbucket"))
    store.analyze("oz", Seq("o_custkey", "o_totalprice"))
    val got = store.readWhere("oz",
        Seq(("o_custkey", 10L, 80L), ("o_totalprice", 1000.0, 20000.0)))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val want = orders.filter(col("o_custkey").between(10, 80) &&
        col("o_totalprice").between(1000.0, 20000.0))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
  }
}
