package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** PII redaction: each class replaced with its tag, counts agree with
  * the redaction, clean text untouched, order rules hold (an email is
  * never double-counted as an IP or phone). */
class PiiFunctionsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._
  import PiiFunctions._

  private def redact(s: String): (String, Int, Int, Int) = {
    val df = Seq(s).toDF("t")
    val counts = piiCounts(col("t")).map { case (n, c) => c.as(n) }
    val r = df.select(redactPii(col("t")).as("r") +: counts: _*).head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  test("emails, IPs, and phones each get their tag") {
    assert(redact("mail bob.smith+x@corp.example.org now") ==
      (("mail <EMAIL> now", 1, 0, 0)))
    assert(redact("from 192.168.001.1 port 80") == (("from <IP> port 80", 0, 1, 0)))
    assert(redact("call 555-0134 or 555 0199") == (("call <PHONE> or <PHONE>", 0, 0, 2)))
  }

  test("mixed text: all three classes redacted, counts agree") {
    val (r, e, i, p) = redact("a@b.io at 10.0.0.1 tel 555-1234")
    assert(r == "<EMAIL> at <IP> tel <PHONE>" && (e, i, p) == ((1, 1, 1)))
  }

  test("an email with an IP-shaped domain is one email, zero IPs") {
    val (r, e, i, _) = redact("root@10.0.0.1.example.com logged in")
    assert(r == "<EMAIL> logged in" && e == 1 && i == 0)
  }

  test("clean text passes through untouched") {
    val s = "no personal data here, just 42 plain words."
    assert(redact(s) == ((s, 0, 0, 0)))
  }

  test("digits inside an IP are not phone matches") {
    val (r, _, i, p) = redact("host 255.255 123.456.789.012 x")
    assert(i == 1 && p == 0 && r == "host 255.255 <IP> x")
  }

  test("luhnValid: canonical valid and invalid numbers") {
    import spark.implicits._
    import graft.functions.PiiFunctions.luhnValid
    import org.apache.spark.sql.functions.col
    // 79927398713 is THE textbook Luhn example; its 10 sibling check
    // digits are all invalid — exactly one in ten passes
    val cases = (0 to 9).map(cd => s"7992739871$cd")
    val got = cases.toDF("s").select(col("s"), luhnValid(col("s")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach(c => assert(got(c) == (c == "79927398713"), c))
  }

  test("luhnValid: non-digits, empty, and NULL are false, not errors") {
    import spark.implicits._
    import graft.functions.PiiFunctions.luhnValid
    import org.apache.spark.sql.functions.col
    val df = Seq(Some("4111-1111-1111-1111"), Some(""), Some("abc"), None)
      .toDF("s").select(luhnValid(col("s")).as("v"))
    assert(df.collect().forall(r => !r.isNullAt(0) && !r.getBoolean(0)))
  }

  test("luhnValid: doubling overflow branch (digits >= 5 doubled)") {
    import spark.implicits._
    import graft.functions.PiiFunctions.luhnValid
    import org.apache.spark.sql.functions.col
    // "18" reversed "81": 8 (check digit, undoubled) + 1*2 = 10 -> valid
    assert(Seq("18").toDF("s").select(luhnValid(col("s"))).head().getBoolean(0))
    // "59" reversed "95": 9 + (5*2 - 9) = 10 -> valid (overflow branch)
    assert(Seq("59").toDF("s").select(luhnValid(col("s"))).head().getBoolean(0))
  }
}
