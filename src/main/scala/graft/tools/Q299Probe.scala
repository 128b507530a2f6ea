package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway stage-timing probe for q299 (not part of the surface). */
object Q299Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32", "q299-probe")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    li.select(col("l_quantity"), col("l_extendedprice")).count()

    val micro = 1000000L
    val u = li.filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
      .select(
        (col("l_quantity").cast("decimal(18,6)") * lit(micro).cast("decimal(7,0)"))
          .cast("long").as("__xU"),
        (col("l_extendedprice").cast("decimal(18,6)") * lit(micro).cast("decimal(7,0)"))
          .cast("long").as("__yU"))
    time("count u")(u.count())
    val s = time("sums")(u.agg(count(lit(1)).as("n"),
      sum(col("__xU").cast("decimal(38,0)")).as("sx"),
      sum(col("__yU").cast("decimal(38,0)")).as("sy")).head())
    val n = s.getLong(0)
    println(s"[probe] n=$n")
    val r0 = BigDecimal(s.getDecimal(2)).toDouble / BigDecimal(s.getDecimal(1)).toDouble
    val slopeUs = graft.operators.QuantileRegression.slopeFactors(17)
      .map(f => new java.math.BigDecimal(r0 * f)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()).distinct
    val slopeDf = slopeUs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("__i", "__bU")
    val r12 = col("__yU") * lit(micro) - col("__bU") * col("__xU")
    val r6 = ((r12 - pmod(r12, lit(micro))) / lit(micro)).cast("long")
    val lowBits = 26
    // stage 1: the fanned select only
    time("fan select count")(
      u.crossJoin(broadcast(slopeDf)).select(col("__i"), r6.as("__r")).count())
    // stage 2: hist groupBy
    val hist = u.crossJoin(broadcast(slopeDf))
      .select(col("__i"), r6.as("__r"))
      .groupBy(col("__i"), shiftright(col("__r"), lowBits).as("__bk"))
      .agg(count(lit(1)).as("__c"), sum(col("__r").cast("decimal(38,0)")).as("__s"))
    time("hist count")(println("[probe] hist rows: " + hist.count()))
    time("hist count again")(hist.count())
    // long-sum variant (no decimal)
    val histL = u.crossJoin(broadcast(slopeDf))
      .select(col("__i"), r6.as("__r"))
      .groupBy(col("__i"), shiftright(col("__r"), lowBits).as("__bk"))
      .agg(count(lit(1)).as("__c"), sum(col("__r")).as("__s"))
    time("hist-longsum count")(histL.count())
    // bisect: group on raw r12 bucket (no pmod/divide floor)
    val histRaw = u.crossJoin(broadcast(slopeDf))
      .select(col("__i"), r12.as("__r12"))
      .groupBy(col("__i"), shiftright(col("__r12"), lowBits + 20).as("__bk"))
      .agg(count(lit(1)).as("__c"), sum(col("__r12")).as("__s"))
    time("hist-raw-r12 count")(histRaw.count())
    // bisect: full r6 but no sum agg (count only)
    val histNoSum = u.crossJoin(broadcast(slopeDf))
      .select(col("__i"), r6.as("__r"))
      .groupBy(col("__i"), shiftright(col("__r"), lowBits).as("__bk"))
      .agg(count(lit(1)).as("__c"))
    time("hist-no-sum count")(histNoSum.count())
    // bisect: r6 via pure long div (pmod-free floor)
    val r6l = ((r12 - ((r12 % micro + micro) % micro)) / lit(micro)).cast("long")
    val histLl = u.crossJoin(broadcast(slopeDf))
      .select(col("__i"), r6l.as("__r"))
      .groupBy(col("__i"), shiftright(col("__r"), lowBits).as("__bk"))
      .agg(count(lit(1)).as("__c"), sum(col("__r")).as("__s"))
    time("hist-longdiv count")(histLl.count())
    println("[probe] u partitions: " + u.rdd.getNumPartitions)
    // the fix candidate: spread the corpus before the fan
    val uR = u.repartition(32)
    val histR = uR.crossJoin(broadcast(slopeDf))
      .select(col("__i"), r6.as("__r"))
      .groupBy(col("__i"), shiftright(col("__r"), lowBits).as("__bk"))
      .agg(count(lit(1)).as("__c"), sum(col("__r").cast("decimal(38,0)")).as("__s"))
    time("hist-repartitioned count")(histR.count())
    time("hist-repartitioned again")(histR.count())
    spark.stop()
  }
}
