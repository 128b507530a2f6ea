package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent dataset fingerprints — "are these two tables the
  * same data?" answered in ONE narrow pass + one scalar aggregate, with
  * no sort, no shuffle of the data, and no engine lock-in. The everyday
  * uses in a 100 TB pipeline: verify a migration/export landed
  * bit-complete (the q158/q184 interchange story's missing equality
  * check), compare a replica against its source without moving either,
  * and pin a corpus RELEASE to a checksum that any engine can recompute
  * (the reproducibility companion of the q183 release pipeline).
  *
  * Construction: each row maps to the engine's replayable hash stack
  * (q177's polynomial → Knuth scramble) over its SEPARATOR-JOINED
  * column values; the fingerprint is the exact SUM of row hashes in
  * DECIMAL(38,0) (commutative-associative, so ANY row order and ANY
  * partitioning give identical bits), folded to BIGINT mod 2⁶². A
  * DuckDB/any-SQL replay reproduces it hash-for-hash — unlike an
  * xxhash64-based digest, which pins verification to Spark.
  *
  * Contracts (documented, not silent): columns are rendered with
  * `CAST(col AS STRING)` — use exact-typed columns (ints, strings,
  * decimals, dates); floating-point columns must be rounded/cast by the
  * caller first (float formatting is not cross-engine canonical). NULL
  * renders as the sentinel `␀` (distinct from the empty string); values
  * containing U+0001 (the field separator) would collide — engine text
  * columns never do. Text iteration is UNICODE-TOTAL: Spark's
  * `split('')`/`ascii` and DuckDB's `string_split('')`/`ascii` both
  * walk CODE POINTS (UTF8String is UTF-8 underneath; `ascii` returns
  * the full code point, 120143 for U+1D54F, not a surrogate half), so
  * supplementary-plane text (emoji, rare CJK) hashes identically in
  * both engines — verified empirically and pinned by
  * StringKeyUnicodeSpec against DuckDB-computed constants; the q184
  * gate replays a supplementary-plane payload through the live oracle
  * every round.
  *
  * Collision note: the 62-bit sum is an EQUALITY WITNESS, not a
  * cryptographic digest — a mismatch proves difference; a match proves
  * equality up to a ~2⁻⁶² adversarial collision, ample for release
  * accounting (the same trust level as every content-hash dedup the
  * engine ships). */
object Fingerprint {

  private val Sep = ""
  private val NullSentinel = "␀"
  private val Fold = 4611686018427387904L // 2^62

  /** The replayable per-row hash column. */
  private def rowHash(cols: Seq[String]): Column = {
    val rendered = cols.map(c => coalesce(col(c).cast("string"), lit(NullSentinel)))
    val joined = concat_ws(Sep, rendered: _*)
    pmod(pmod(Splits.stringKey(joined), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))
  }

  /** One row: (n_rows, checksum) over the named columns. */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    df.select(rowHash(cols).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h").cast("decimal(38,0)")) % Fold).cast("long").as("checksum"))
  }

  /** Per-group fingerprints: (groupCol, n_rows, checksum) — the
    * per-source/per-partition release accounting form. The group column
    * itself is NOT part of the row hash unless listed in `cols`. */
  def groupChecksum(df: DataFrame, groupCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    df.select(col(groupCol), rowHash(cols).as("__h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h").cast("decimal(38,0)")) % Fold).cast("long").as("checksum"))
  }
}
