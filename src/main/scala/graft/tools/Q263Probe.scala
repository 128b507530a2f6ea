package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway stage-timing probe for q263/q276 (not part of the surface). */
object Q263Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32", "q263-probe")
    val d = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.t(spark, d, "documents")
    docs.count() // warm
    val base = docs.select(
      col("n_chars").as("n_chars"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("n_tokens"),
      (col("lang") === "en").as("is_en"))
    for (round <- 1 to 2) {
      time(s"r$round base count")(base.count())
      time(s"r$round candidates (2x globalRanks)") {
        for (f <- Seq("n_chars", "n_tokens")) {
          val vals = base.filter(col(f).isNotNull && col("is_en").isNotNull)
            .select(col(f).cast("long").as("__x"))
          val n = vals.count()
          graft.operators.ExactQuantile.globalRanks(vals, "__x",
            (1 to 16).map(k => (k * n + 16) / 17).filter(_ >= 1).distinct,
            lowBits = 8).collect()
        }
      }
      time(s"r$round full Stump.train")(
        graft.operators.Stump.train(base, Seq("n_chars", "n_tokens"),
          "is_en", thresholds = 16).collect())
    }
    spark.stop()
  }
}
