package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Pins [[Splits.stringKey]] to Unicode-TOTAL cross-engine semantics:
  * the expected constants below were computed by DuckDB's replay stack
  * (`list_reduce(list_prepend(0, list_transform(list_filter(
  * string_split(s, ''), c -> c <> ''), c -> ascii(c))), (a,b) ->
  * (a*31+b) % 1000000007)`), so a green run proves Spark's
  * `split('')`/`ascii` iterate the SAME units DuckDB does — full code
  * points, including supplementary-plane (emoji U+1F600, mathematical
  * U+1D54F), not UTF-16 halves. The q184 gate replays one such payload
  * through the live oracle; this spec keeps the contract pinned even
  * when gate data shifts. */
class StringKeyUnicodeSpec extends AnyFunSuite with SparkSuite {

  // (string, DuckDB-computed key, DuckDB length)
  private def cases: Seq[(String, Long, Int)] = Seq(
    ("a" + new String(Character.toChars(0x1D54F)) + "b", 3817748L, 3),
    ("caf" + new String(Character.toChars(0xE9)), 3045921L, 4),
    (new String(Character.toChars(0x1F600)) + "x", 3983992L, 2),
    ("plain", 106748362L, 5),
    ("", 0L, 0),
    (new String(Character.toChars(0x1F600)) + new String(Character.toChars(0x1D54F)) +
      "中文mix", 721150452L, 7))

  test("stringKey matches the DuckDB replay on supplementary-plane text") {
    import spark.implicits._
    val df = cases.map(_._1).toDF("s")
      .select(col("s"), Splits.stringKey(col("s")).as("k"), length(col("s")).as("len"))
    val got = df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    cases.foreach { case (s, k, l) =>
      assert(got(s) == ((k, l)), s"mismatch for ${s.map(_.toInt).mkString("[", ",", "]")}")
    }
  }

  test("ascii returns full code points, not surrogate halves") {
    import spark.implicits._
    val sup = new String(Character.toChars(0x1F600)) // 128512, would be 55357 as a high surrogate
    val cp = Seq(sup).toDF("s").select(ascii(col("s"))).head().getInt(0)
    assert(cp == 128512)
  }
}
