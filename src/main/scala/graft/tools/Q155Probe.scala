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
    spark.stop()
  }
}
