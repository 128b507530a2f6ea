package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSuite

class SchemaAuditSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("classifies every JSON value class from the raw token") {
    val docs = Seq(
      """{"f": 42}""" -> "int",
      """{"f": -7}""" -> "int",
      """{"f": 3.5}""" -> "float",
      """{"f": 1.2e-4}""" -> "float",
      """{"f": "42"}""" -> "string",
      """{"f": "a \"quoted\" one"}""" -> "string",
      """{"f": true}""" -> "bool",
      """{"f": false}""" -> "bool",
      """{"f": null}""" -> "null",
      """{"f": [1, 2]}""" -> "array",
      """{"f": {"x": 1}}""" -> "object",
      """{"g": 9}""" -> "missing")
    val got = docs.map(_._1).toDF("doc")
      .select(SchemaAudit.typeClass(col("doc"), "f").as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got == docs.map(_._2))
  }

  test("flags exactly the planted dominant-type flip") {
    // epochs 0-1: nc numeric; epoch 2: the producer starts quoting it;
    // id stays int throughout
    val rows = (0 until 30).map { i =>
      val e = i % 3
      val nc = if (e == 2) s""""${100 + i}"""" else s"${100 + i}"
      (e.toLong, s"""{"id": $i, "nc": $nc}""")
    }
    val out = SchemaAudit.audit(rows.toDF("epoch", "doc"), "epoch", "doc",
      Seq("id", "nc")).collect()
    assert(out.length == 6)
    val flips = out.filter(_.getAs[Boolean]("flipped"))
      .map(r => (r.getAs[String]("field"), r.getAs[Long]("epoch"))).toSeq
    assert(flips == Seq(("nc", 2L)))
    val nc2 = out.find(r => r.getAs[String]("field") == "nc" &&
      r.getAs[Long]("epoch") == 2L).get
    assert(nc2.getAs[String]("dom_type") == "string" &&
      nc2.getAs[String]("prev_type") == "int")
    assert(out.filter(_.getAs[String]("field") == "id")
      .forall(_.getAs[String]("dom_type") == "int"))
  }

  test("dominance is by count with deterministic ties; n_docs sums classes") {
    // epoch 0: 6 ints, 4 strings -> int dominates with 6 of 10
    val rows = (0 until 10).map { i =>
      val v = if (i < 6) s"$i" else s""""$i""""
      (0L, s"""{"f": $v}""")
    }
    val r = SchemaAudit.audit(rows.toDF("epoch", "doc"), "epoch", "doc",
      Seq("f")).head()
    assert(r.getAs[String]("dom_type") == "int")
    assert(r.getAs[Long]("n_dom") == 6L && r.getAs[Long]("n_docs") == 10L)
    assert(!r.getAs[Boolean]("flipped"))
  }

  test("drifted gives the quarantine predicate for the flipped epoch") {
    val rows = Seq((2L, """{"nc": "99"}"""), (2L, """{"nc": 7}"""),
      (1L, """{"nc": "88"}"""))
    val bad = rows.toDF("epoch", "doc")
      .filter(SchemaAudit.drifted("epoch", "doc", "nc",
        epoch = 2L, expectedType = "int"))
      .collect()
    assert(bad.map(_.getString(1)).toSeq == Seq("""{"nc": "99"}"""))
  }

  test("partitioning-invariant") {
    val rows = (0 until 60).map { i =>
      val e = i % 3
      val v = if (e == 2 && i % 2 == 0) s""""$i"""" else s"$i"
      (e.toLong, s"""{"f": $v}""")
    }
    val df = rows.toDF("epoch", "doc")
    def run(d: org.apache.spark.sql.DataFrame) =
      SchemaAudit.audit(d, "epoch", "doc", Seq("f"))
        .collect().map(_.toString).toSeq
    assert(run(df.coalesce(1)) == run(df.repartition(13)))
  }
}
