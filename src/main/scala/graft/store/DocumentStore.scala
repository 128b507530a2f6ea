package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned copy-on-write parquet store: the engine's answer to the
  * reference's mutable MongoDB collections (S4-S7, TX1;
  * MongoDbService.cs:241-439, :563-613) on an immutable file format.
  *
  * Layout per table:
  * {{{
  *   <root>/<table>/data/v<N>/<part>/...parquet   physical segments
  *   <root>/<table>/_versions/v<N>.manifest       partition -> segment dir
  *   <root>/<table>/_CURRENT                      current version number
  * }}}
  *
  * Every mutation commits a NEW manifest that reuses the segment dirs of
  * untouched partitions and points touched partitions at freshly written
  * dirs — so an upsert of one session rewrites one partition, not 100 TB.
  * The commit is a single atomic `_CURRENT` swap (write temp + ATOMIC_MOVE),
  * which is the TX1 transaction: readers see the old version until the
  * swap, and a crash mid-write leaves garbage segments but a consistent
  * table. Single-writer by design (the reference's app tier is too).
  */
class DocumentStore(spark: SparkSession, root: String) {

  private def tdir(table: String): Path = Paths.get(root, table)

  private def currentVersion(table: String): Int = {
    val f = tdir(table).resolve("_CURRENT")
    if (Files.exists(f)) new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toInt
    else 0
  }

  private def manifest(table: String, v: Int): Map[String, String] = {
    val f = tdir(table).resolve("_versions").resolve(s"v$v.manifest")
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).map { l =>
        val Array(k, dir) = l.split("\t", 2); k -> dir
      }.toMap
  }

  private def commit(table: String, v: Int, m: Map[String, String]): Unit = {
    val vd = tdir(table).resolve("_versions"); Files.createDirectories(vd)
    val body = m.toSeq.sorted.map { case (k, d) => s"$k\t$d" }.mkString("\n")
    Files.write(vd.resolve(s"v$v.manifest"), body.getBytes(StandardCharsets.UTF_8))
    val tmp = tdir(table).resolve(s"_CURRENT.tmp$v")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, tdir(table).resolve("_CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The partition key expression: user column, or a single bucket for
    * unpartitioned tables. Values are directory-name-safe strings. */
  private def partExpr(partitionCol: Option[String]): Column = partitionCol match {
    case Some(c) => regexp_replace(coalesce(col(c).cast("string"), lit("__null")),
      "[^A-Za-z0-9_\\-]", "_")
    case None => lit("all")
  }

  private def writeSegments(table: String, df: DataFrame, v: Int,
                            partitionCol: Option[String]): Map[String, String] = {
    val out = tdir(table).resolve("data").resolve(s"v$v").toString
    df.withColumn("__part", partExpr(partitionCol))
      .write.mode("overwrite").partitionBy("__part").parquet(out)
    // enumerate written partitions
    Files.list(Paths.get(out)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("__part="))
      .map { p =>
        val key = p.getFileName.toString.stripPrefix("__part=")
        key -> p.toString
      }.toMap
  }

  def exists(table: String): Boolean = Files.exists(tdir(table).resolve("_CURRENT"))

  /** Create/replace the table (bulk load — the §3.2 ingest sink). */
  def create(table: String, df: DataFrame, partitionCol: Option[String] = None): Unit = {
    val v = currentVersion(table) + 1
    Files.createDirectories(tdir(table))
    savePartCol(table, partitionCol)
    commit(table, v, writeSegments(table, df, v, partitionCol))
  }

  private def savePartCol(table: String, pc: Option[String]): Unit =
    Files.write(tdir(table).resolve("_PARTCOL"),
      pc.getOrElse("").getBytes(StandardCharsets.UTF_8))

  private def partCol(table: String): Option[String] = {
    val f = tdir(table).resolve("_PARTCOL")
    if (!Files.exists(f)) None
    else Option(new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim).filter(_.nonEmpty)
  }

  /** Snapshot read of the current version (no partial states visible). */
  def read(table: String): DataFrame = {
    val m = manifest(table, currentVersion(table))
    if (m.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(m.values.toSeq: _*)
  }

  /** Snapshot read restricted to the named partition-key values —
    * manifest-level partition pruning: segment dirs of other partitions
    * are never even listed, let alone opened. The IVF search path reads
    * only its nprobe centroid partitions through this. */
  def readPartitions(table: String, partKeys: Seq[String]): DataFrame = {
    val m = manifest(table, currentVersion(table))
    val safe = partKeys.map(_.replaceAll("[^A-Za-z0-9_\\-]", "_")).toSet
    val dirs = m.filter { case (k, _) => safe.contains(k) }.values.toSeq
    if (dirs.nonEmpty) spark.read.parquet(dirs: _*)
    // no matching partitions: keep the TABLE's schema (a zero-column
    // emptyDataFrame would crash callers selecting result columns)
    else if (m.nonEmpty) read(table).limit(0)
    else spark.emptyDataFrame
  }

  /** S5: keyed upsert (ReplaceOne(IsUpsert=true) analog). Only partitions
    * containing updated keys are rewritten; the rest of the table is
    * carried by manifest reference. */
  def upsert(table: String, updates: DataFrame, keys: Seq[String]): Unit = {
    val pc = partCol(table)
    val v0 = currentVersion(table); val v = v0 + 1
    val m0 = manifest(table, v0)
    val updatePartKeys = updates.select(partExpr(pc).as("__part")).distinct()
      .collect().map(_.getString(0)).toSet
    // A matching OLD row may live in a different partition than its
    // replacement when the update moves the partition column. If the
    // partition column is part of the key (the reference's compound keys
    // always include it: (categoryId,_id) etc.), updates' partitions are
    // exactly the victims — no scan. Otherwise, locate victims with a
    // column-pruned key scan over the rest of the table.
    val touchedKeys: Set[String] =
      if (pc.isEmpty || keys.contains(pc.get)) updatePartKeys
      else {
        val restDirs = m0.filter { case (k, _) => !updatePartKeys.contains(k) }.values.toSeq
        if (restDirs.isEmpty) updatePartKeys
        else updatePartKeys ++ spark.read.parquet(restDirs: _*)
          .join(updates.select(keys.map(col): _*).distinct(), keys, "left_semi")
          .select(partExpr(pc).as("__part")).distinct()
          .collect().map(_.getString(0))
      }
    val touchedDirs = m0.filter { case (k, _) => touchedKeys.contains(k) }.values.toSeq
    val existing =
      if (touchedDirs.isEmpty) None
      else Some(spark.read.parquet(touchedDirs: _*))
    val merged = existing match {
      case None => updates
      case Some(cur) =>
        val kept = cur.join(updates.select(keys.map(col): _*).distinct(),
          keys, "left_anti")
        kept.unionByName(updates.select(kept.columns.map(col): _*))
    }
    val written = writeSegments(table, merged, v, pc)
    commit(table, v, (m0 -- touchedKeys) ++ written)
  }

  /** S6/S7: delete rows matching the predicate (point or bulk). The scan
    * prunes to partitions that may match only when the predicate binds
    * the partition column via the caller-supplied hint. */
  def delete(table: String, predicate: Column,
             touchedParts: Option[Seq[String]] = None): Unit = {
    val pc = partCol(table)
    val v0 = currentVersion(table); val v = v0 + 1
    val m0 = manifest(table, v0)
    val victims: Map[String, String] = touchedParts match {
      case Some(ps) =>
        val safe = ps.map(_.replaceAll("[^A-Za-z0-9_\\-]", "_")).toSet
        m0.filter { case (k, _) => safe.contains(k) }
      case None => m0
    }
    if (victims.isEmpty) return
    // SQL DELETE semantics: remove only rows where the predicate is TRUE.
    // A bare !predicate would also drop rows where it evaluates to NULL
    // (e.g. a NULL column in col("price") > 100) — silent data loss.
    val remaining = spark.read.parquet(victims.values.toSeq: _*)
      .filter(!coalesce(predicate, lit(false)))
    val written = writeSegments(table, remaining, v, pc)
    commit(table, v, (m0 -- victims.keySet) ++ written)
  }

  def version(table: String): Int = currentVersion(table)

  /** Garbage-collect segment directories referenced only by manifests
    * older than the `keepVersions` most recent ones, then drop those
    * manifests. Old snapshots stay readable down to the retention
    * horizon (time travel); beyond it, storage is reclaimed — without
    * this, a COW store's storage grows with write count, not data size.
    * Safe wrt the single-writer contract: only dirs unreferenced by ALL
    * retained manifests are deleted, and `_CURRENT` is never touched. */
  def vacuum(table: String, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, "must keep at least the current version")
    val cur = currentVersion(table)
    val vd = tdir(table).resolve("_versions")
    if (!Files.exists(vd)) return
    val all = Files.list(vd).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
      .toSeq.sorted
    val (drop, keep) = all.partition(v => v <= cur - keepVersions)
    if (drop.isEmpty) return
    val live = keep.flatMap(v => manifest(table, v).values).toSet
    val dead = drop.flatMap(v => manifest(table, v).values).toSet -- live
    dead.foreach { dir =>
      val p = Paths.get(dir)
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      }
    }
    drop.foreach(v => Files.deleteIfExists(vd.resolve(s"v$v.manifest")))
  }
}
