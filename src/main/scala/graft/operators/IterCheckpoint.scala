package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-iteration materialization for the fixpoint operators (PageRank,
  * KCore, LabelProp, Bfs, Hits, Clusters) — one shared seam instead of
  * six copies of the localCheckpoint/track/release idiom.
  *
  * Default mode is the q155 discipline: eager `localCheckpoint` (a leaf
  * LogicalRDD — constant plan depth at any iteration count) with the
  * pinned blocks tracked and released explicitly via [[Pinned]].
  *
  * `spark.graft.reliableCheckpointInterval = N` (default 0 = off) routes
  * every N-th materialization through scratch parquet instead
  * ([[graft.store.Scratch]]) — the executor-loss insurance local
  * checkpoints cannot give: a local checkpoint's blocks live on the
  * executors that computed them and CANNOT be recomputed (lineage is
  * truncated), so one lost executor kills a 50-iteration run; a scratch
  * parquet iteration is re-readable by any executor (point
  * `spark.graft.scratchDir` at shared storage on a real cluster).
  * N = 1 makes EVERY iteration durable — the setting for preemptible
  * nodes; N > 1 bounds the scratch I/O to every N-th iteration (the
  * localCheckpoint iterations between still die with an executor, but
  * they are recomputable FROM the last durable one by rerunning the
  * operator — the interval trades write overhead against how much work
  * a restart repeats). Cost per reliable iteration: one output-sized
  * parquet write + scan (see PLANS.md for the measured local overhead).
  * Each reliable iteration's dir is deleted by its handle's
  * `release()`, so at most two live at once mid-run.
  *
  * Local default stays 0: at local[32] there is no executor to lose,
  * and the localCheckpoint path is the faster one.
  */
object IterCheckpoint {

  /** One materialized iteration: `df` is the leaf scan; `release()`
    * frees the backing storage (checkpoint blocks or scratch dir). */
  sealed trait Handle {
    def df: DataFrame
    def release(): Unit
  }

  private final case class PinnedH(p: Pinned.Df) extends Handle {
    def df: DataFrame = p.df
    def release(): Unit = p.release()
  }

  private final case class ScratchH(df: DataFrame, path: String) extends Handle {
    def release(): Unit = graft.store.Scratch.release(path)
  }
}

final class IterCheckpoint(spark: SparkSession, tag: String) {
  import IterCheckpoint._

  private val interval: Int =
    spark.conf.getOption("spark.graft.reliableCheckpointInterval")
      .map(_.trim.toInt).getOrElse(0)
  require(interval >= 0, s"bad reliableCheckpointInterval $interval")

  private var calls = 0

  /** Eagerly materialize one iteration's frame. */
  def materialize(df: DataFrame): Handle = {
    calls += 1
    if (interval > 0 && calls % interval == 0) {
      val (scan, path) =
        graft.store.Scratch.materializeTracked(df, s"$tag-it$calls")
      ScratchH(scan, path)
    } else PinnedH(Pinned.checkpoint(df))
  }
}
