package graft.store

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}
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
  * The commit is a single atomic `_CURRENT` swap (write temp + rename
  * with Options.Rename.OVERWRITE), which is the TX1 transaction: readers
  * see the old version until the swap, and a crash mid-write leaves
  * garbage segments but a consistent table. Single-writer by design (the
  * reference's app tier is too).
  *
  * All metadata IO goes through the Hadoop FileSystem API (resolved from
  * the root path's scheme), so the store works unchanged on local disk,
  * HDFS, or any object store with a Hadoop connector — the same contract
  * the IVF sidecar uses (IvfIndex.writeSidecar). Rename-atomicity is the
  * storage layer's: real on HDFS/local posix; on S3-like stores the
  * single-writer contract carries the guarantee instead.
  */
class DocumentStore(spark: SparkSession, root: String) {

  private val hconf = spark.sessionState.newHadoopConf()
  private val fs: FileSystem = new HPath(root).getFileSystem(hconf)
  private val rootPath: HPath = fs.makeQualified(new HPath(root))
  // FileContext provides rename-with-overwrite (FileSystem.rename refuses
  // an existing destination on HDFS) — the ATOMIC_MOVE analog.
  private lazy val fc: FileContext = FileContext.getFileContext(rootPath.toUri, hconf)

  private def tdir(table: String): HPath = new HPath(rootPath, table)

  private def readString(p: HPath): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8))
      finally in.close()
    }

  private def writeString(p: HPath, body: String): Unit = {
    val out = fs.create(p, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def currentVersion(table: String): Int =
    readString(new HPath(tdir(table), "_CURRENT")).map(_.trim.toInt).getOrElse(0)

  private def manifest(table: String, v: Int): Map[String, String] = {
    if (v == 0) return Map.empty // table never created
    val f = new HPath(new HPath(tdir(table), "_versions"), s"v$v.manifest")
    // a committed version MUST have its manifest: reading a corrupted
    // table (_CURRENT pointing at a missing manifest) as empty would
    // silently turn data loss into an empty-table answer
    val body = readString(f).getOrElse(throw new IllegalStateException(
      s"table '$table' is corrupted: _CURRENT points at version $v but $f is missing"))
    body.split("\n").iterator
      .filter(_.nonEmpty).map { l =>
        val Array(k, dir) = l.split("\t", 2); k -> dir
      }.toMap
  }

  private def commit(table: String, v: Int, m: Map[String, String]): Unit = {
    val vd = new HPath(tdir(table), "_versions"); fs.mkdirs(vd)
    val body = m.toSeq.sorted.map { case (k, d) => s"$k\t$d" }.mkString("\n")
    writeString(new HPath(vd, s"v$v.manifest"), body)
    val tmp = new HPath(tdir(table), s"_CURRENT.tmp$v")
    writeString(tmp, v.toString)
    fc.rename(tmp, new HPath(tdir(table), "_CURRENT"), Options.Rename.OVERWRITE)
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
    val out = new HPath(new HPath(tdir(table), "data"), s"v$v")
    df.withColumn("__part", partExpr(partitionCol))
      .write.mode("overwrite").partitionBy("__part").parquet(out.toString)
    // enumerate written partitions
    fs.listStatus(out).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__part="))
      .map { st =>
        val key = st.getPath.getName.stripPrefix("__part=")
        key -> st.getPath.toString
      }.toMap
  }

  def exists(table: String): Boolean = fs.exists(new HPath(tdir(table), "_CURRENT"))

  /** Create/replace the table (bulk load — the §3.2 ingest sink). */
  def create(table: String, df: DataFrame, partitionCol: Option[String] = None): Unit = {
    val v = currentVersion(table) + 1
    fs.mkdirs(tdir(table))
    savePartCol(table, partitionCol)
    commit(table, v, writeSegments(table, df, v, partitionCol))
  }

  private def savePartCol(table: String, pc: Option[String]): Unit =
    writeString(new HPath(tdir(table), "_PARTCOL"), pc.getOrElse(""))

  private def partCol(table: String): Option[String] =
    readString(new HPath(tdir(table), "_PARTCOL")).map(_.trim).filter(_.nonEmpty)

  /** Snapshot read of the current version (no partial states visible). */
  def read(table: String): DataFrame = {
    val m = manifest(table, currentVersion(table))
    if (m.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(m.values.toSeq: _*)
  }

  /** Time-travel read: the table exactly as of committed version `v`
    * (1-based; `version(table)` is the newest). COW segments are
    * immutable, so the snapshot is consistent by construction. Valid
    * while `v`'s manifest survives [[vacuum]]'s retention horizon;
    * asking for a reclaimed version fails loudly (missing manifest),
    * never silently serves partial data. */
  def readVersion(table: String, v: Int): DataFrame = {
    val cur = currentVersion(table)
    require(v >= 1 && v <= cur, s"version $v out of range 1..$cur for table '$table'")
    val m = manifest(table, v)
    if (m.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(m.values.toSeq: _*)
  }

  /** Committed versions whose manifests are currently retained
    * (readable via [[readVersion]]), ascending. */
  def versions(table: String): Seq[Int] = {
    val vd = new HPath(tdir(table), "_versions")
    if (!fs.exists(vd)) Seq.empty
    else fs.listStatus(vd).iterator
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
      .toSeq.sorted
  }

  /** Row-level diff between two retained versions (`fromV` < `toV`
    * typically, but any pair works): the table schema plus a `change`
    * column of 'added' / 'removed' — the pipeline-audit view of what a
    * mutation epoch actually did. Multiplicity-aware (`exceptAll`), so a
    * duplicate row inserted twice shows up twice. Cost: one hash
    * aggregation over the two snapshots' rows — there is no cheaper
    * general answer for a format whose segments are content-addressed
    * per partition, and unchanged partitions could be pruned by
    * comparing manifests first (not done: manifest dirs differ whenever
    * the partition was REWRITTEN, not only when rows changed). */
  def diff(table: String, fromV: Int, toV: Int): DataFrame = {
    val before = readVersion(table, fromV)
    val after = readVersion(table, toV)
    after.exceptAll(before).withColumn("change", lit("added"))
      .unionByName(before.exceptAll(after).withColumn("change", lit("removed")))
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
    val vd = new HPath(tdir(table), "_versions")
    if (!fs.exists(vd)) return
    val all = fs.listStatus(vd).iterator
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
      .toSeq.sorted
    val (drop, keep) = all.partition(v => v <= cur - keepVersions)
    val live = keep.flatMap(v => manifest(table, v).values).toSet
    val dead = drop.flatMap(v => manifest(table, v).values).toSet -- live
    dead.foreach { dir =>
      val p = new HPath(dir)
      val dfs = p.getFileSystem(hconf)
      if (dfs.exists(p)) dfs.delete(p, true)
    }
    drop.foreach(v => fs.delete(new HPath(vd, s"v$v.manifest"), false))
    // Crash-garbage sweep: a mutation that died between writeSegments and
    // commit leaves a data/v<K> dir referenced by NO manifest, which the
    // manifest-driven pass above can never reach. Under the single-writer
    // contract no write is in flight during vacuum, so any version dir
    // not referenced by a retained manifest is garbage.
    val dataDir = new HPath(tdir(table), "data")
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir).iterator.filter(_.isDirectory).foreach { st =>
        val prefix = st.getPath.toString
        val referenced = live.exists(d => d == prefix || d.startsWith(prefix + "/"))
        if (!referenced) fs.delete(st.getPath, true)
      }
    }
  }
}
