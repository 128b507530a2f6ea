package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

class SaltedJoinSpec extends AnyFunSuite with SparkSuite {

  test("salted join == plain join (orders x customer)") {
    val orders = t(spark, sf, "orders")
    val customer = t(spark, sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    def sorted(df: org.apache.spark.sql.DataFrame) = df
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
      .orderBy(col("o_orderkey")).collect().toSeq
    val plain = sorted(orders.join(customer, Seq("o_custkey")))
    val salted = sorted(SaltedJoin.inner(orders, customer, Seq("o_custkey"), salts = 7))
    assert(plain == salted)
  }

  test("skewed input: all rows on one key still join correctly") {
    import spark.implicits._
    val left = (1L to 10000L).map(i => (1L, i)).toDF("k", "v")
    val right = Seq((1L, "hot"), (2L, "cold")).toDF("k", "name")
    val out = SaltedJoin.inner(left, right, Seq("k"), salts = 16)
    assert(out.count() == 10000)
    assert(out.select("name").distinct().collect().map(_.getString(0)).toSeq == Seq("hot"))
  }
}
