package graft.store

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class BucketingSpec extends AnyFunSuite with SparkSuite {

  /** Shuffle count in the FINAL adaptive plan — AQE only materializes the
    * real plan during execution, so run the query first. */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count()
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case _: ShuffleExchangeExec => n += 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  test("bucketed x bucketed join runs with zero shuffles, same answer") {
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = t(spark, sf, "orders")
      val customer = t(spark, sf, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
      Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 8)
      Bucketing.writeBucketed(customer, "customer_b", "o_custkey", 8)

      val plain = orders.join(customer, Seq("o_custkey"))
      val bucketed = spark.table("orders_b").join(spark.table("customer_b"), Seq("o_custkey"))

      assert(shuffles(plain) > 0, "control: unbucketed join should shuffle")
      assert(shuffles(bucketed) == 0, "bucketed join must be exchange-free")
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("groupBy on the bucket key skips the exchange too") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(t(spark, sf, "orders"), "orders_b2", "o_custkey", 8)
      val agg = spark.table("orders_b2").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      assert(shuffles(agg) == 0, "bucketed aggregation must be exchange-free")
      assert(agg.count() == t(spark, sf, "orders").select("o_custkey").distinct().count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b2")
    }
  }
}
