package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class Scd2Spec extends AnyFunSuite with SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def changes = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "bronze"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "bronze"), // restated: no new interval
      (1L, ts("2024-01-03 00:00:00"), 3L, "gold"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "bronze"), // back: NEW interval (type 2)
      (2L, ts("2024-01-01 00:00:00"), 5L, "silver")
    ).toDF("key", "ts", "seq", "tier")
  }

  private def history = Scd2.fromChanges(changes, "key", "ts", Seq("tier"), "seq")

  test("consecutive duplicate states collapse; revisited states open new intervals") {
    val rows = history.filter(col("key") === 1)
      .orderBy("version")
      .select("tier", "valid_from", "valid_to", "version", "is_current")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("bronze", "gold", "bronze"))
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    // intervals chain: each valid_to == next valid_from, last open
    assert(rows(0).getTimestamp(2) == rows(1).getTimestamp(1))
    assert(rows(1).getTimestamp(2) == rows(2).getTimestamp(1))
    assert(rows(2).isNullAt(2) && rows(2).getBoolean(4))
  }

  test("exactly one open (is_current) interval per key") {
    val open = history.filter(col("is_current")).groupBy("key").count().collect()
    assert(open.forall(_.getLong(1) == 1L))
    assert(open.map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("as-of lookup through the history reproduces the event-time state") {
    // probe at a time inside each interval; join on interval containment
    import spark.implicits._
    val probes = Seq((1L, ts("2024-01-02 12:00:00")), (1L, ts("2024-01-05 00:00:00")),
      (2L, ts("2024-06-01 00:00:00"))).toDF("key", "at")
    val got = probes.join(history, Seq("key"))
      .filter(col("at") >= col("valid_from") &&
        (col("valid_to").isNull || col("at") < col("valid_to")))
      .orderBy("key", "at").select("tier").as[String].collect()
    assert(got.toSeq == Seq("bronze", "bronze", "silver"))
  }

  test("two runs starting at the same timestamp chain deterministically by run order") {
    import spark.implicits._
    // key 7: two DISTINCT states at the same ts (tie-broken by seq), then
    // a third state later. Runs 1 and 2 share valid_from; the valid_to
    // lead must follow event order (__run), not an arbitrary equal-ts pick.
    val df = Seq(
      (7L, ts("2024-03-01 00:00:00"), 1L, "a"),
      (7L, ts("2024-03-01 00:00:00"), 2L, "b"),
      (7L, ts("2024-03-05 00:00:00"), 3L, "c")
    ).toDF("key", "ts", "seq", "tier")
    val rows = Scd2.fromChanges(df, "key", "ts", Seq("tier"), "seq")
      .orderBy("version")
      .select("tier", "valid_from", "valid_to", "version", "is_current")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    // chaining follows run order: a→(same ts)=b's start, b→c's start, c open
    assert(rows(0).getTimestamp(2) == ts("2024-03-01 00:00:00"))
    assert(rows(1).getTimestamp(2) == ts("2024-03-05 00:00:00"))
    assert(rows(2).isNullAt(2) && rows(2).getBoolean(4))
  }

  test("point-in-time interval lookup adds no shuffle over the history") {
    import spark.implicits._
    // the lookup join must not re-shuffle the history: a small probe set
    // broadcasts (the serve shape — SCD2's own window Exchange stays the
    // plan's ONLY hash shuffle); a corpus-scale probe side would SMJ,
    // reusing the history's existing key partitioning either way
    val probes = Seq((1L, ts("2024-01-03 12:00:00")), (2L, ts("2024-02-01 00:00:00")))
      .toDF("key", "at")
    val pit = probes.join(history.withColumnRenamed("key", "h_key"),
      probes("key") === col("h_key") &&
        col("at") >= col("valid_from") &&
        (col("valid_to").isNull || col("at") < col("valid_to")))
    val plan = pit.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"history re-shuffled: $exchanges hash exchanges:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"probe side not broadcast:\n$plan")
    val got = pit.select(col("key"), col("tier")).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "gold"), (2L, "silver")))
  }

  test("one shuffle: a single Exchange below the final sort lineage") {
    val plan = history.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 key shuffle, got $exchanges:\n$plan")
  }
}
