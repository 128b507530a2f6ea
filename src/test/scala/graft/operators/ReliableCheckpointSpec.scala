package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The executor-loss insurance contract of [[IterCheckpoint]]:
  *
  * Local checkpoints CANNOT be recomputed once their blocks are gone
  * (lineage is truncated) — unpersisting them simulates exactly what an
  * executor loss does to an iterative run. The spec proves
  *  1. the default path really does die under block loss (the option is
  *     load-bearing, not vacuous),
  *  2. with `spark.graft.reliableCheckpointInterval = 1` a full
  *     multi-iteration PageRank run COMPLETES while every persistent
  *     block is killed after every job, and matches the undisturbed
  *     trajectory bit-for-bit,
  *  3. iteration scratch dirs are released as the run advances — the
  *     reliable mode does not trade pinned blocks for unbounded temp
  *     disk.
  */
class ReliableCheckpointSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
    (5L, 6L), (6L, 4L), (6L, 7L), (7L, 1L), (2L, 5L)
  ).toDF("src", "dst")

  private def withConf[T](key: String, value: String)(body: => T): T = {
    spark.conf.set(key, value)
    try body finally spark.conf.unset(key)
  }

  test("localCheckpoint iterations die when their blocks are lost") {
    val iter = new IterCheckpoint(spark, "spec-die")
    val h = iter.materialize(edges.groupBy("src").agg(count(lit(1)).as("d")))
    assert(h.df.count() == 7) // blocks alive: readable
    // simulated executor loss: drop every persistent block, synchronously
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // lineage was truncated by the checkpoint — the data is gone for good
    intercept[Exception] { h.df.count() }
    h.release()
  }

  test("interval=1 iterations survive total block loss") {
    withConf("spark.graft.reliableCheckpointInterval", "1") {
      val iter = new IterCheckpoint(spark, "spec-survive")
      val h = iter.materialize(edges.groupBy("src").agg(count(lit(1)).as("d")))
      assert(h.df.count() == 7)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // parquet-backed: any executor can re-read it
      assert(h.df.count() == 7)
      h.release()
    }
  }

  test("PageRank completes under continual block loss and matches the undisturbed run") {
    // force the DISTRIBUTED iterate path — the driver-resident fast
    // path (r19) holds its state off-executor and would pass trivially
    withConf("spark.graft.pagerank.driverLoopMaxNodes", "0") {
      val expected = PageRank.run(edges, "src", "dst", iterations = 8)
        .orderBy("node").as[(Long, Long)].collect().toSeq

      // kill EVERY persistent block after EVERY job — normal persists
      // (edge/node tables) recover via lineage; local checkpoints would
      // not, which is why this only passes in reliable mode
      val killer = new SparkListener {
        override def onJobEnd(end: SparkListenerJobEnd): Unit =
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
      }
      spark.sparkContext.addSparkListener(killer)
      try {
        val got = withConf("spark.graft.reliableCheckpointInterval", "1") {
          PageRank.run(edges, "src", "dst", iterations = 8)
            .orderBy("node").as[(Long, Long)].collect().toSeq
        }
        assert(got == expected)
      } finally spark.sparkContext.removeSparkListener(killer)
    }
  }

  test("driver-resident and distributed PageRank paths are bit-identical") {
    val viaDriver = PageRank.run(edges, "src", "dst", iterations = 7)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val viaDistributed = withConf("spark.graft.pagerank.driverLoopMaxNodes", "0") {
      PageRank.run(edges, "src", "dst", iterations = 7)
        .orderBy("node").as[(Long, Long)].collect().toSeq
    }
    assert(viaDriver == viaDistributed)
  }

  test("reliable iterations release their scratch dirs as the run advances") {
    val before = graft.store.Scratch.liveCount
    withConf("spark.graft.reliableCheckpointInterval", "1") {
      withConf("spark.graft.pagerank.driverLoopMaxNodes", "0") {
        PageRank.run(edges, "src", "dst", iterations = 6).count()
      }
    }
    // every per-iteration dir was freed by its successor's release();
    // only the FINAL rank table (the returned scan) may remain live
    val after = graft.store.Scratch.liveCount
    assert(after - before <= 1, s"scratch dirs leaked: $before -> $after")
  }

  test("interval=2 alternates pinned and parquet-backed iterations") {
    withConf("spark.graft.reliableCheckpointInterval", "2") {
      val iter = new IterCheckpoint(spark, "spec-alt")
      val base = edges.select(col("src").as("node"))
      val h1 = iter.materialize(base) // call 1: localCheckpoint
      val h2 = iter.materialize(base) // call 2: scratch parquet
      val pinned = spark.sparkContext.getPersistentRDDs
      assert(pinned.nonEmpty, "call 1 should have pinned checkpoint blocks")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      intercept[Exception] { h1.df.count() } // checkpoint: gone
      assert(h2.df.count() == 10)            // parquet: survives
      h1.release(); h2.release()
    }
  }
}
