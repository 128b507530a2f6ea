package graft.store

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Output-sized scratch rematerialization — the unpinned alternative to
  * returning a `localCheckpoint` plan from an operator.
  *
  * The r13→r17 lesson: an operator that returns a plan over its own
  * local checkpoint leaves ONE pinned RDD in the shared JVM per call
  * (`getPersistentRDDs` holds it until the caller's reference is GC'd),
  * and in a long-lived session those blocks accumulate and tax every
  * neighboring query. Writing the RESULT (never the corpus) once to
  * scratch parquet and returning a clean scan costs one output-sized
  * write, pins nothing, and is the more cluster-correct shape anyway:
  * local checkpoint blocks cannot be recomputed after executor loss,
  * while a scratch file can be re-read by any executor.
  *
  * Scratch root resolution:
  *   - `spark.graft.scratchDir` if set — on a real cluster point this at
  *     shared storage (HDFS/object store), exactly like a reliable
  *     checkpoint dir;
  *   - otherwise a per-JVM temp directory, deleted on JVM exit — and
  *     ONLY legal under a `local[*]` master: on a multi-executor cluster
  *     a driver-local temp root would have each executor write to its
  *     own filesystem and the read back silently miss data, so the
  *     default root REFUSES non-local masters loudly (an r18 advisor
  *     finding) instead of corrupting results.
  *
  * Disk hygiene (an r18 advisor finding — scratch dirs used to live
  * until JVM exit): every written path is REGISTERED, releasable two
  * ways:
  *   - precisely, via the path handle ([[materializeTracked]] /
  *     [[release]]) — the iterative operators free each iteration's dir
  *     as soon as the successor lands;
  *   - in bulk, via [[sweep]] — the harness hook Verify/Bench run
  *     between queries, mirroring their persistent-RDD sweep, so a
  *     long-lived session's scratch disk is bounded by one query's
  *     output, not the session's history.
  */
object Scratch {

  private val seq = new AtomicLong(0L)

  @volatile private var defaultRoot: Option[Path] = None

  /** Live (written, not yet released) scratch dirs. */
  private val live = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.scratchDir").getOrElse {
      val master = spark.sparkContext.master
      require(master.startsWith("local"),
        s"Scratch: master '$master' is not local and spark.graft.scratchDir " +
          "is unset — the default driver-local temp root is invisible to " +
          "remote executors (reads would silently miss data). Point " +
          "spark.graft.scratchDir at shared storage (HDFS/object store).")
      synchronized {
        defaultRoot match {
          case Some(p) => p.toString
          case None =>
            val p = Files.createTempDirectory("graft-scratch-")
            Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p)))
            defaultRoot = Some(p)
            p.toString
        }
      }
    }

  private def delete(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
    }
  }

  /** Materialize `df` ONCE to scratch parquet and return a clean scan of
    * it. The returned plan references no persisted blocks and no input
    * lineage — callers may unpersist/close whatever `df` depended on as
    * soon as this returns. Intended for OUTPUT-sized frames (a rank
    * table, a keeper-id list, a per-doc offset map) — never for
    * re-staging a corpus.
    *
    * `coalesceTo > 0` coalesces the write to that many files — the
    * node-sized results of the graph operators land as a handful of
    * right-sized parquet files instead of one shuffle-partition-count of
    * tiny ones (the r18 q155 bench overhead was mostly per-file
    * open/commit cost). `df` is always a materialized leaf (checkpoint
    * or parquet scan) at the call sites, so the coalesce narrows only
    * the write job, never an upstream aggregation. */
  def rematerialize(df: DataFrame, tag: String, coalesceTo: Int = 0): DataFrame =
    materializeTracked(df, tag, coalesceTo)._1

  /** [[rematerialize]] plus the written path, for callers that release
    * precisely (the per-iteration reliable checkpoints). */
  def materializeTracked(df: DataFrame, tag: String,
                         coalesceTo: Int = 0): (DataFrame, String) = {
    val spark = df.sparkSession
    val path = s"${root(spark)}/$tag-${seq.incrementAndGet()}"
    val w = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    w.write.mode("overwrite").parquet(path)
    live.add(path)
    (spark.read.parquet(path), path)
  }

  /** Default file count for node-sized operator outputs
    * (`spark.graft.scratchOutputFiles`, default 8; 0 = keep the input
    * partitioning — set that on huge outputs where 8 files would mean
    * multi-GB row groups). */
  def outputFiles(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.scratchOutputFiles")
      .map(_.trim.toInt).getOrElse(8)

  /** Delete one registered scratch dir. No-op for unknown paths (e.g.
    * already swept). Callers must be done READING the scan returned for
    * this path — the files go away immediately. */
  def release(path: String): Unit =
    if (live.remove(path)) delete(Paths.get(path))

  /** Delete ALL registered scratch dirs; returns how many. The harness
    * hook between queries (Verify/Bench), run only after the previous
    * query's result has been fully consumed — any still-held scan over
    * a swept dir fails on next read, by design. */
  def sweep(): Int = {
    import scala.jdk.CollectionConverters._
    val paths = live.asScala.toSeq
    paths.foreach(release)
    paths.size
  }

  /** Registered-but-unreleased dir count (test/tripwire surface). */
  def liveCount: Int = live.size
}
