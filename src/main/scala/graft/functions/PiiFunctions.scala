package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction for corpus cleaning — the pre-training
  * hygiene pass that strips emails, bare IPv4 addresses, and phone-like
  * numbers before text is used as training data.
  *
  * Pure `regexp_replace` chains: codegen'd, no UDF, and the patterns
  * stay inside the RE2-compatible subset (no lookaround, no backrefs)
  * so the same pattern text runs identically in Spark (java.util.regex)
  * and the DuckDB oracle (RE2).
  *
  * Replacement order matters and is fixed: emails first (an email's
  * domain may embed an IP-shaped string), then IPs, then phone-like
  * digit groups (which could otherwise match inside an address).
  */
object PiiFunctions {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[- ]\\d{4}\\b"

  /** Redact all three PII classes with typed placeholder tags. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Luhn (mod-10) checksum validity of an all-digit string — the
    * checksum every real payment-card number satisfies (ISO/IEC 7812).
    * The PII-precision lever: a bare 16-digit regex redacts order ids,
    * timestamps, and hashes wholesale; gating the redaction on the
    * checksum redacts actual card-shaped numbers at ~10× fewer false
    * positives (a random digit string passes 1-in-10). Pure integer
    * column arithmetic over the reversed digit sequence (double every
    * second digit from the right, fold digit sums mod 10) — no UDF,
    * engine-replayable (DuckDB: list_reduce over the same reversed
    * walk). NULL/empty/non-digit input → false, not an error (the
    * caller regex-extracts candidates; this validates them). */
  def luhnValid(digits: Column): Column = {
    val s = reverse(digits)
    val terms = transform(sequence(lit(1), length(s)), i => {
      val d = ascii(substring(s, i, lit(1))) - 48
      val dd = d * 2
      when(pmod(i, lit(2)) === 0, when(dd > 9, dd - 9).otherwise(dd)).otherwise(d)
    })
    // the rlike guard (>= 1 digit) precedes the fold, so the sequence
    // is never asked to ascend from 1 to 0 (it would DESCEND — the
    // Boilerplate/resample lesson); And short-circuits left-to-right
    digits.isNotNull && digits.rlike("^[0-9]+$") &&
      coalesce(pmod(aggregate(terms, lit(0), (a, x) => a + x), lit(10)) === 0,
        lit(false))
  }

  /** Per-class match counts as [[redactPii]] would replace them: each
    * class is counted on the text with the earlier classes already
    * redacted, so the audit columns agree exactly with the redaction. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))),
    "n_ips" -> size(regexp_extract_all(regexp_replace(text, EmailRe, "<EMAIL>"),
      lit(Ipv4Re), lit(0))),
    "n_phones" -> size(regexp_extract_all(
      regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
      lit(PhoneRe), lit(0))))
}
