package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway stage-timing probe for q260 (not part of the surface). */
object Q260Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32", "q260-probe")
    val d = args.headOption.getOrElse("/tmp/graft-sf1-r11")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.t(spark, d, "documents")
    docs.count() // warm
    val cleaned = regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " . ")
    val toks = graft.operators.Spread.byKey(docs, "doc_id")
      .select(col("doc_id").as("__id"),
        posexplode(split(cleaned, " ")).as(Seq("__pos", "__w")))
      .withColumn("__stop",
        col("__w") === "" || col("__w") === "." ||
          col("__w").isin(graft.operators.Rake.Stopwords: _*))
    println(s"[probe] toks partitions: ${toks.rdd.getNumPartitions}")
    val noStop = docs.repartition(32, col("doc_id"))
      .select(col("doc_id").as("__id"),
        posexplode(split(cleaned, " ")).as(Seq("__pos", "__w")))
    val wd = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val runs = toks
      .withColumn("__run", sum(when(col("__stop"), 1L).otherwise(0L)).over(wd))
      .filter(!col("__stop"))
    val phrases = runs.groupBy(col("__id"), col("__run"))
      .agg(count(lit(1)).as("__len"),
        array_join(transform(array_sort(collect_list(
          struct(col("__pos"), col("__w")))), s => s.getField("__w")), " ")
          .as("phrase"))
      .filter(col("__len") <= 4)
    val spreadDocs = graft.operators.Spread.byKey(docs, "doc_id")
    for (round <- 1 to 2) {
      time(s"r$round trivial docs.count")(docs.count())
      time(s"r$round trivial range sum")(
        spark.range(1000000L).agg(sum(col("id"))).head())
      time(s"r$round shuffle only (spread count)")(spreadDocs.count())
      time(s"r$round lower+length only")(
        spreadDocs.select(length(lower(col("text"))).as("l"))
          .agg(sum(col("l"))).head())
      time(s"r$round regexp only")(
        spreadDocs.select(length(cleaned).as("l")).agg(sum(col("l"))).head())
      time(s"r$round regexp+split (no explode)")(
        spreadDocs.select(size(split(cleaned, " ")).as("n")).agg(sum(col("n"))).head())
      time(s"r$round token count (sum sizes)") {
        val n = spreadDocs.select(size(split(cleaned, " ")).cast("long").as("n"))
          .agg(sum(col("n"))).head().getLong(0)
        println(s"[probe] total tokens: $n")
      }
      time(s"r$round split+posexplode only")(noStop.count())
      time(s"r$round tokenize count")(toks.count())
      time(s"r$round runs (window) count")(runs.count())
      time(s"r$round phrases agg count")(phrases.count())
      time(s"r$round full q260")(
        graft.operators.Rake.keywords(docs, "doc_id", "text").count())
    }
    spark.stop()
  }
}
