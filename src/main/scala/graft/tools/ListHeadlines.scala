package graft.tools

/** Print the headline query names (driver utility). */
object ListHeadlines {
  def main(args: Array[String]): Unit =
    println("HEADLINE " + graft.SparkEntry.headlineQueries.mkString(","))
}
