package graft

import org.scalatest.funsuite.AnyFunSuite

/** Walks EVERY `SparkEntry.queries` gate at sf0.001 and fails on any
  * DecimalType column in the published schema — the spec form of the
  * [[GateLint]] rule, so the q184/q240 decimal-vs-float64 hash family
  * cannot reach the driver a third time. Builders that mutate state
  * (stores, streams) run for real here; sf0.001 keeps that cheap. */
class QuerySchemaLintSpec extends AnyFunSuite with SparkSuite {

  test("no gate publishes a DecimalType column") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      spark.catalog.clearCache()
      try {
        val bad = GateLint.decimalColumns(fn(spark, sf).schema)
        if (bad.isEmpty) Nil else Seq(s"$name: ${bad.mkString(", ")}")
      } catch {
        // a builder that cannot run here is Verify's problem, not the
        // schema lint's — surface it but do not mask decimal findings
        case e: Throwable => Seq(s"$name: BUILD FAILED (${e.getMessage})")
      }
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }
}
