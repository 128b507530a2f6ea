package graft.tools

import graft.GraftSession

/** Throwaway A/B probe: PageRank driver-resident vs distributed path. */
object Q155Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32", "q155-probe")
    val d = args.headOption.getOrElse("/tmp/graft-sf1-r11")
    val q = graft.SparkEntry.queries("q155_pagerank")
    def time(tag: String): Unit = {
      val t0 = System.nanoTime()
      q(spark, d).count()
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    q(spark, "/root/testdata/sf0.1").count() // warm
    for (r <- 1 to 2) {
      spark.conf.set("spark.graft.pagerank.driverLoopMaxNodes", "0")
      time(s"r$r distributed")
      spark.conf.set("spark.graft.pagerank.driverLoopMaxNodes", "4000000")
      time(s"r$r driver-loop")
    }
    // reliable-checkpoint price: distributed path, interval 1 vs off —
    // the delta over 5 iterations is the per-iteration scratch cost
    spark.conf.set("spark.graft.pagerank.driverLoopMaxNodes", "0")
    def timeAt(tag: String, dir: String): Unit = {
      val t0 = System.nanoTime()
      q(spark, dir).count()
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 2) {
      spark.conf.unset("spark.graft.reliableCheckpointInterval")
      timeAt(s"r$r sf0.1 localCheckpoint", "/root/testdata/sf0.1")
      spark.conf.set("spark.graft.reliableCheckpointInterval", "1")
      timeAt(s"r$r sf0.1 reliable every iter", "/root/testdata/sf0.1")
      spark.conf.set("spark.graft.reliableCheckpointInterval", "2")
      timeAt(s"r$r sf0.1 reliable every 2nd", "/root/testdata/sf0.1")
    }
    spark.conf.unset("spark.graft.reliableCheckpointInterval")
    spark.conf.unset("spark.graft.pagerank.driverLoopMaxNodes")
    spark.stop()
  }
}
