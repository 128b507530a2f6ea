package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Fingerprint

/** Verifiable corpus-release artifact: plain parquet (any engine reads
  * it) plus a `_MANIFEST` of order-independent, engine-portable
  * fingerprints ([[Fingerprint]]) — total and per group. The consumer
  * re-computes the checksums with ONE narrow pass in their own engine
  * and knows the release arrived bit-complete: no row lost, none
  * duplicated, none altered — without trusting the producer's stack or
  * sorting a byte. This is the delivery half the interchange family
  * (CSV q158/q163, ORC q184, JSON q53) was missing: those prove
  * round-trip fidelity inside the engine; the manifest proves fidelity
  * ACROSS engines and across the copy.
  *
  * Layout under `dir`:
  *   data/            parquet, range-partitioned + sorted by the id
  *                    column (reproducible file contents for a fixed
  *                    partition count; parallelism = file count)
  *   _MANIFEST        TSV: scope, n_rows, checksum — first line the
  *                    table scope `*`, then one line per group value
  *
  * The manifest is written AFTER the data commits, from the same
  * DataFrame lineage; [[verify]] recomputes everything from the
  * PUBLISHED files, so a partial copy, truncation, or bit-rot between
  * publish and consume is caught regardless of where it happened. */
object Release {

  private val TableScope = "*"

  /** Publish `df` under `dir`. `cols` are the fingerprinted columns
    * (exact-typed — the [[Fingerprint]] contract); `groupCol` adds
    * per-group accounting lines (and must not be null-valued);
    * `format` is any self-describing splittable writer the consumer
    * reads natively (parquet, orc — the q184 interchange pair). The
    * manifest is format-agnostic: checksums are over VALUES, so the
    * same corpus published in both formats carries identical lines. */
  def publish(df: DataFrame, dir: String, idCol: String, cols: Seq[String],
              groupCol: Option[String] = None,
              format: String = "parquet"): Unit = {
    require(cols.nonEmpty, "need fingerprint columns")
    require(Seq("parquet", "orc").contains(format), s"unsupported format $format")
    df.repartitionByRange(col(idCol)).sortWithinPartitions(col(idCol))
      .write.mode("errorifexists").format(format).save(s"$dir/data")
    val published = df.sparkSession.read.format(format).load(s"$dir/data")
    val t = Fingerprint.tableChecksum(published, cols).head()
    val tableLine = s"$TableScope\t${t.getLong(0)}\t${t.getLong(1)}"
    val groupLines = groupCol.toSeq.flatMap { g =>
      Fingerprint.groupChecksum(published, g, cols)
        .orderBy(col(g)).collect()
        .map(r => s"${r.get(0)}\t${r.getLong(1)}\t${r.getLong(2)}")
    }
    Files.write(Paths.get(s"$dir/_MANIFEST"),
      (tableLine +: groupLines).mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  /** Recompute every manifest line from the published data. Returns
    * (scope, n_manifest, n_actual, checksum_manifest, checksum_actual,
    * ok) — one row per manifest line; `ok` false anywhere means the
    * release is not the data the producer fingerprinted. Group scopes
    * absent from the data report zero actuals (ok = false), so a
    * dropped group is loud, not silently missing. */
  def verify(spark: SparkSession, dir: String, cols: Seq[String],
             groupCol: Option[String] = None,
             format: String = "parquet"): DataFrame = {
    import spark.implicits._
    val manifest = Files.readString(Paths.get(s"$dir/_MANIFEST"))
      .split("\n").toSeq.map { line =>
        val Array(scope, n, c) = line.split("\t")
        (scope, n.toLong, c.toLong)
      }.toDF("scope", "n_manifest", "checksum_manifest")
    val published = spark.read.format(format).load(s"$dir/data")
    val table = Fingerprint.tableChecksum(published, cols)
      .select(lit(TableScope).as("scope"), col("n_rows"), col("checksum"))
    val actual = groupCol match {
      case None => table
      case Some(g) => table.unionByName(
        Fingerprint.groupChecksum(published, g, cols)
          .select(col(g).cast("string").as("scope"), col("n_rows"), col("checksum")))
    }
    manifest.join(actual, Seq("scope"), "left")
      .select(col("scope"), col("n_manifest"),
        coalesce(col("n_rows"), lit(0L)).as("n_actual"),
        col("checksum_manifest"),
        coalesce(col("checksum"), lit(-1L)).as("checksum_actual"),
        (col("n_manifest") === coalesce(col("n_rows"), lit(0L)) &&
          col("checksum_manifest") === coalesce(col("checksum"), lit(-1L))).as("ok"))
  }
}
