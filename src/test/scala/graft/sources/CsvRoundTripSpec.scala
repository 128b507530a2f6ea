package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class CsvRoundTripSpec extends AnyFunSuite with SparkSuite {

  private def roundTrip(df: org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    CsvRoundTrip.write(df, dir)
    CsvRoundTrip.read(spark, dir, df.schema)
  }

  test("separators, quotes, newlines, CRLF, and backslashes survive verbatim") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain"),
      (2L, "comma,inside"),
      (3L, "quote\"inside"),
      (4L, "new\nline"),
      (5L, "crlf\r\nline"),
      (6L, "back\\slash"),
      (7L, "\"leading and trailing\""),
      (8L, "all,of\"it\n\\,\"together\"")
    ).toDF("id", "s")
    val got = roundTrip(nasty).orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = nasty.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("NULL and empty string stay distinct") {
    import spark.implicits._
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some(""))).toDF("id", "s")
    val got = roundTrip(df).orderBy("id").collect()
    assert(got(0).getString(1) == "x")
    assert(got(1).isNullAt(1))
    assert(got(2).getString(1) == "")
  }

  test("types round trip through the pinned schema (long, double, timestamp)") {
    import spark.implicits._
    val df = Seq((1L, 1.5, java.sql.Timestamp.valueOf("2024-02-29 23:59:59")))
      .toDF("id", "v", "ts")
    val got = roundTrip(df).collect()(0)
    assert(got.getLong(0) == 1L && got.getDouble(1) == 1.5)
    assert(got.getTimestamp(2) == java.sql.Timestamp.valueOf("2024-02-29 23:59:59"))
  }

  test("the null sentinel as DATA survives (it gets quoted away? no — documented collision)") {
    import spark.implicits._
    // The documented contract: data equal to the sentinel is the one
    // ambiguity; it reads back as NULL. Assert the documented behavior
    // so a silent change is caught.
    val df = Seq((1L, CsvRoundTrip.NullSentinel)).toDF("id", "s")
    val got = roundTrip(df).collect()(0)
    assert(got.isNullAt(1))
  }
}
