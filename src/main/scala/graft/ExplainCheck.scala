object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("8", "explain-check")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q294_dispersion_fano", "q283_cohort_retention",
        "q293_vocab_richness", "q302_levene_test")) {
      val p = graft.SparkEntry.queries(q)(spark, d)
        .queryExecution.executedPlan.toString
      println(s"$q scans=${"Scan parquet".r.findAllIn(p).length} " +
        s"reused=${"ReusedExchange".r.findAllIn(p).length} " +
        s"exchanges=${"Exchange".r.findAllIn(p).length}")
    }
    spark.stop()
  }
}
