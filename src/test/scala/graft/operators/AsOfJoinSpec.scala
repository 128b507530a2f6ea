package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

class AsOfJoinSpec extends AnyFunSuite with SparkSuite {

  private def mk(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "key", "t", "payload")
      .withColumn("t", timestamp_micros(col("t") * 1000000))
  }

  test("picks the latest right row at or before the left time, per key") {
    val left = mk(Seq((1L, 1L, 10L, "l1"), (2L, 1L, 20L, "l2"), (3L, 2L, 15L, "l3")))
    val right = mk(Seq((100L, 1L, 5L, "r5"), (101L, 1L, 12L, "r12"),
      (102L, 1L, 25L, "r25"), (103L, 3L, 1L, "other-key")))
    val out = AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "t",
        Seq("id", "payload"), prefix = "r_")
      .orderBy(col("id")).collect()
    assert(out.length == 3)
    // left t=10 -> r5 (t=5); t=20 -> r12; key 2 has no right rows -> null
    assert(out(0).getAs[String]("r_payload") == "r5")
    assert(out(1).getAs[String]("r_payload") == "r12")
    assert(out(2).isNullAt(out(2).fieldIndex("r_payload")))
  }

  test("inclusive: a right row at exactly the left time matches") {
    val left = mk(Seq((1L, 1L, 10L, "l")))
    val right = mk(Seq((100L, 1L, 10L, "same-instant"), (101L, 1L, 9L, "earlier")))
    val out = AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "t",
      Seq("payload"), prefix = "r_").collect()
    assert(out.head.getAs[String]("r_payload") == "same-instant")
  }

  test("NULL keys never match (SQL equi-join semantics)") {
    import org.apache.spark.sql.types.LongType
    val left = mk(Seq((1L, 1L, 10L, "l1"), (2L, 0L, 20L, "l2")))
      .withColumn("key", when(col("key") === 0L, lit(null).cast(LongType)).otherwise(col("key")))
    val right = mk(Seq((100L, 1L, 5L, "r"), (101L, 0L, 5L, "rnull")))
      .withColumn("key", when(col("key") === 0L, lit(null).cast(LongType)).otherwise(col("key")))
    val out = AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "t",
      Seq("payload"), prefix = "r_").orderBy(col("id")).collect()
    assert(out.length == 2) // left-join: NULL-key left row kept...
    assert(out(0).getAs[String]("r_payload") == "r")
    assert(out(1).isNullAt(out(1).fieldIndex("r_payload"))) // ...but matches nothing
  }

  test("all left rows survive (left-join semantics)") {
    val left = mk((1L to 50L).map(i => (i, i % 5, i, s"l$i")))
    val right = mk(Seq((100L, 0L, 3L, "r")))
    val n = AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "t",
      Seq("payload")).count()
    assert(n == 50)
  }

  test("user columns named like internals (__t, __side) pass through intact") {
    val left = mk(Seq((1L, 1L, 10L, "l1")))
      .withColumn("__t", lit("user-t")).withColumn("__side", lit("user-side"))
    val right = mk(Seq((100L, 1L, 5L, "r5"))).withColumn("__carry", lit("user-carry"))
    val out = AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "t",
      Seq("payload", "__carry"), prefix = "r_").collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("__t") == "user-t")
    assert(out.head.getAs[String]("__side") == "user-side")
    assert(out.head.getAs[String]("r_payload") == "r5")
    assert(out.head.getAs[String]("r___carry") == "user-carry")
  }

  test("randomized equivalence vs brute-force range-join + argmax") {
    val rnd = new scala.util.Random(42)
    // random keys/times WITH collisions to stress ties and empty matches;
    // payload equals id so the deterministic tiebreak (greatest payload)
    // maps to greatest id — mirrored in the brute-force maxBy below
    val left = mk((1L to 300L).map(i =>
      (i, rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, s"l$i")))
    val right = mk((1000L until 1200L).map(i =>
      (i, rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, s"r$i")))
    val got = AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "t",
        Seq("id"), prefix = "r_")
      .select("id", "r_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val rightRows = right.select("id", "key", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val expected = left.select("id", "key", "t").collect().map { r =>
      val (lid, lk, lt) = (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime)
      val matches = rightRows.filter { case (_, rk, rt) => rk == lk && rt <= lt }
      // latest time; among ties the greatest payload (= struct ordering
      // over (id) here) wins
      lid -> (if (matches.isEmpty) -1L
              else matches.maxBy { case (rid, _, rt) => (rt, rid) }._1)
    }.toMap
    assert(got == expected)
  }

  test("right rows tied on (key, time) resolve deterministically (greatest payload)") {
    val left = mk(Seq((1L, 1L, 10L, "l")))
    // two right rows at the same instant — repartition shuffles their
    // arrival order; the winner must still be stable
    val right = mk(Seq((100L, 1L, 10L, "aaa"), (101L, 1L, 10L, "zzz")))
    (1 to 3).foreach { p =>
      val out = AsOfJoin.leftAsOf(left, right.repartition(p), Seq("key"),
        "t", "t", Seq("id", "payload"), prefix = "r_").collect()
      assert(out.head.getAs[Long]("r_id") == 101L, s"partitions=$p")
      assert(out.head.getAs[String]("r_payload") == "zzz")
    }
  }

  test("nearest: picks the closest side, backward wins exact ties") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 1L, 315L), (4L, 2L, 50L))
      .toDF("id", "key", "t")
    val right = Seq((10L, 1L, 90L), (11L, 1L, 210L), (12L, 1L, 320L))
      .toDF("rid", "key", "t")
    val out = AsOfJoin.nearest(left, right, Seq("key"), "t", "t", "id",
        Seq("t", "rid"), "n_")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("n_rid"))) -1L else r.getAs[Long]("n_rid"))).toMap
    assert(out(1L) == 10L)  // t=100: 90 (d=10) beats 210 (d=110)
    assert(out(2L) == 11L)  // t=200: 210 (d=10) beats 90 (d=110)
    assert(out(3L) == 12L)  // t=315: 320 (d=5) beats 210 (d=105)
    assert(out(4L) == -1L)  // key 2 has no right rows: NULL payload
  }

  test("nearest: hand-checked distances including the exact-tie rule") {
    import spark.implicits._
    // left t=200: backward 90 (d=110), forward 210 (d=10) -> forward
    // left t=150: backward 90 (d=60), forward 210 (d=60) -> TIE -> backward
    val left = Seq((1L, 1L, 200L), (2L, 1L, 150L), (3L, 9L, 5L))
      .toDF("id", "key", "t")
    val right = Seq((10L, 1L, 90L), (11L, 1L, 210L)).toDF("rid", "key", "t")
    val out = AsOfJoin.nearest(left, right, Seq("key"), "t", "t", "id",
        Seq("t", "rid"), "n_")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("n_rid"))) -1L else r.getAs[Long]("n_rid"))).toMap
    assert(out(1L) == 11L)
    assert(out(2L) == 10L)
    assert(out(3L) == -1L) // keyless left row kept with NULL payload
  }

  test("NULL times never match (SQL comparison semantics)") {
    import spark.implicits._
    // right row with NULL time would sort nulls-first and be carried
    // into every left row of the key as a phantom match
    val left = Seq((1L, "k", java.lang.Long.valueOf(100L)),
      (2L, "k", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "key", "t")
    val right = Seq(("k", null.asInstanceOf[java.lang.Long], 777L),
      ("k", java.lang.Long.valueOf(50L), 42L))
      .toDF("key", "t", "payload")
    val out = AsOfJoin.leftAsOf(left, right, Seq("key"), "t", "t",
        Seq("payload")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(1L) == 42L)  // matches the real t=50 row, not the NULL-time one
    assert(out(2L) == -1L)  // NULL left time: kept, null payload
  }

  test("nearest is invariant to partitioning") {
    import spark.implicits._
    val left = (1L to 200L).map(i => (i, i % 7, i * 13 % 1000)).toDF("id", "key", "t")
    val right = (1L to 100L).map(i => (1000L + i, i % 7, i * 29 % 1000))
      .toDF("rid", "key", "t")
    def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      AsOfJoin.nearest(l, r, Seq("key"), "t", "t", "id", Seq("t", "rid"))
        .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(left, right) == run(left.repartition(11), right.repartition(5)))
  }
}
