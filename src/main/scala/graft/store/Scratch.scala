package graft.store

import java.nio.file.{Files, Path}
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
  *   - otherwise a per-JVM temp directory, deleted on JVM exit.
  */
object Scratch {

  private val seq = new AtomicLong(0L)

  @volatile private var defaultRoot: Option[Path] = None

  private def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.scratchDir").getOrElse {
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
    * re-staging a corpus. */
  def rematerialize(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val path = s"${root(spark)}/$tag-${seq.incrementAndGet()}"
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }
}
