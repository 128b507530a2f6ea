package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class GateLintSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("flags top-level and nested decimal columns by dotted path") {
    val df = Seq((1, BigDecimal(2))).toDF("a", "d")
      .select(col("a"), col("d"),
        struct(col("d").as("inner")).as("s"),
        array(col("d")).as("arr"),
        map(lit("k"), col("d")).as("m"))
    val bad = GateLint.decimalColumns(df.schema)
    assert(bad.toSet == Set("d", "s.inner", "arr[]", "m<val>"))
    val e = intercept[IllegalArgumentException] {
      GateLint.assertGateSafe("q_toy", df.schema)
    }
    assert(e.getMessage.contains("q_toy") && e.getMessage.contains("s.inner"))
  }

  test("double/bigint/string schemas pass") {
    val df = Seq((1L, 2.0, "x")).toDF("a", "b", "c")
    assert(GateLint.decimalColumns(df.schema).isEmpty)
    GateLint.assertGateSafe("q_ok", df.schema)
  }
}
