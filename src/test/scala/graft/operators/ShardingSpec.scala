package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Proof obligations for rendezvous sharding: range/determinism, the
  * minimal-disruption invariant (grow-by-one moves keys ONLY to the
  * new shard), the measured balance + move fraction, and tie behavior. */
class ShardingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val ids = (1L to 5000L).toDF("id")

  test("assignments are in range and deterministic across partitionings") {
    val a = ids.select($"id", Sharding.rendezvousShard($"id", 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.values.forall(s => s >= 0 && s < 8))
    val b = ids.repartition(7).select($"id",
        Sharding.rendezvousShard($"id", 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("grow-by-one moves keys ONLY to the new shard (the HRW invariant)") {
    val moved = ids.select(
        Sharding.rendezvousShard($"id", 8).as("s8"),
        Sharding.rendezvousShard($"id", 9).as("s9"))
      .filter($"s8" =!= $"s9")
    // every reassigned key lands on the NEW shard — argmax over a
    // superset differs only when the new element wins
    assert(moved.filter($"s9" =!= 8).count() == 0)
    val frac = moved.count().toDouble / 5000
    assert(frac > 0.06 && frac < 0.17, s"moved frac $frac vs expected ~1/9")
  }

  test("shardAudit balance and move columns agree with direct computation") {
    val audit = Sharding.shardAudit(ids, "id", 8).collect()
    assert(audit.length == 8)
    assert(audit.map(_.getAs[Long]("n")).sum == 5000L)
    val mx = audit.map(_.getAs[Long]("n")).max
    assert(audit.head.getAs[Double]("balance") ==
      BigDecimal(mx * 8.0 / 5000.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // balance within ±15% of ideal at this key count
    assert(audit.head.getAs[Double]("balance") < 1.15)
    val movedTotal = audit.map(_.getAs[Long]("n_moved")).sum
    val direct = ids.select(Sharding.rendezvousShard($"id", 8).as("s8"),
        Sharding.rendezvousShard($"id", 9).as("s9"))
      .filter($"s8" =!= $"s9").count()
    assert(movedTotal == direct)
  }

  test("single shard degenerates to zero and NULL ids are excluded") {
    val one = Sharding.shardAudit(ids, "id", 1).collect()
    assert(one.length == 1 && one.head.getAs[Int]("shard") == 0)
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("id")
    assert(Sharding.shardAudit(withNull, "id", 4)
      .agg(sum($"n")).head().getLong(0) == 2L)
  }
}
