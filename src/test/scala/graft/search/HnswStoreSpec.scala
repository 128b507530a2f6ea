package graft.search

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite
import graft.Tables.t

/** The reference's add/remove lifecycle (AddRemoveData.cs:64-105 — a new
  * product searchable in near-real-time; upsert MongoDbService.cs:241-269,
  * delete :271-293) over the SEGMENTED HNSW graph index: adds append
  * generation-stamped segments, removes are generation-stamped id
  * tombstones, and the tombstone-fraction threshold triggers a compacting
  * rebuild. */
class HnswStoreSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val emb = t(spark, sf, "embeddings")

  private def vecOf(id: Long): Array[Float] =
    emb.filter($"vec_id" === id).head().getAs[scala.collection.Seq[Float]]("embedding").toArray

  private def fresh(frac: Double = 0.5) = {
    val store = new HnswStore(spark,
      Files.createTempDirectory("graft-hnsw-store").toString,
      HnswIndex.Params(m = 8, efConstruction = 48, numSegments = 4),
      maxTombstoneFrac = frac)
    store.build(emb, "embedding", "vec_id")
    store
  }

  private def hits(store: HnswStore, probe: Array[Float], k: Int): Seq[Long] =
    store.search(probe, k, ef = 96).select("vec_id").as[Long].collect().toSeq

  test("add -> immediately searchable; remove -> gone; re-add resurrects") {
    val store = fresh()
    val probe = vecOf(3L)
    val before = hits(store, probe, 10)
    assert(before.contains(3L)) // self-hit sanity

    val dup = Seq((999999L, probe.toSeq)).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    store.add(dup, "embedding", "vec_id")
    assert(hits(store, probe, 10).contains(999999L), "added vector must be searchable")

    store.remove(Seq(999999L))
    val afterRemove = hits(store, probe, 10)
    assert(!afterRemove.contains(999999L), "removed vector must be gone")
    assert(afterRemove.toSet == before.toSet, "original answer restored")

    store.add(dup, "embedding", "vec_id") // tombstone is older than the new gen
    assert(hits(store, probe, 10).contains(999999L), "re-added id must resurrect")
  }

  test("update replaces the stale copy: old vector no longer reachable") {
    val store = fresh()
    val old = vecOf(7L)
    val flipped = old.map(x => -x)
    val upd = Seq((7L, flipped.toSeq)).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    store.add(upd, "embedding", "vec_id")
    // probing with the OLD vector: the stale gen-0 copy would score ~1.0;
    // it must be masked by the tombstone even though the id stays live
    val rows = store.search(old, 10, ef = 96)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(!rows.exists { case (id, s) => id == 7L && s > 0.999 },
      "stale copy surfaced for the old vector")
    // probing with the NEW vector: id 7 is the exact match
    assert(hits(store, flipped, 3).contains(7L))
    // and exactly one live copy exists
    assert(store.liveVectors.filter($"vec_id" === 7L).count() == 1L)
  }

  test("recall >= 0.95 vs exact over live rows after add/remove cycles") {
    val store = fresh()
    // 5 cycles: remove 10 ids, add 10 fresh vectors (perturbed copies)
    var live = emb.select($"vec_id", $"embedding")
    for (c <- 0 until 5) {
      val victims = (c * 10L) until (c * 10L + 10L)
      store.remove(victims)
      live = live.filter(!$"vec_id".isin(victims: _*))
      val adds = victims.map { id =>
        val v = vecOf(id).zipWithIndex.map { case (x, i) =>
          if (i % 7 == c) -x else x }
        (id + 5000L, v.toSeq)
      }
      val addDf = adds.toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
      store.add(addDf, "embedding", "vec_id")
      live = live.union(addDf)
    }
    val k = 20
    var recallSum = 0.0
    for (pid <- Seq(100L, 200L, 300L)) {
      val probe = vecOf(pid)
      val exact = VectorSearch.exactTopK(live, "embedding", "vec_id", probe, k)
        .select("vec_id").as[Long].collect().toSet
      val ann = hits(store, probe, k).toSet
      recallSum += ann.intersect(exact).size.toDouble / k
    }
    assert(recallSum / 3 >= 0.95, s"mean recall ${recallSum / 3} < 0.95 after cycles")
  }

  test("segment count past threshold triggers a merging rebuild (insert-only churn)") {
    val store = new HnswStore(spark,
      Files.createTempDirectory("graft-hnsw-segs").toString,
      HnswIndex.Params(m = 8, efConstruction = 48, numSegments = 4),
      maxSegments = 6)
    store.build(emb, "embedding", "vec_id")
    val base = vecOf(5L)
    // pure inserts: no tombstones, yet segments accumulate per batch
    (0 until 5).foreach { i =>
      val batch = Seq((50000L + i, base.map(_ + (i + 1) * 0.01f).toSeq, 9))
        .toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast("array<float>"))
      store.add(batch, "embedding", "vec_id")
    }
    assert(store.segmentCount <= 6, s"merge never fired: ${store.segmentCount} segments")
    assert(store.tombstoneCount == 0)
    // every inserted id survives the merge and stays searchable
    val got = hits(store, base, 10).toSet
    (0 until 5).foreach(i => assert(got.contains(50000L + i), s"lost id ${50000 + i}"))
  }

  test("tombstone fraction past threshold triggers a compacting rebuild") {
    val store = fresh(frac = 0.05)
    val victims = (0L until 50L).toSeq // 10% of 500 >> 5% threshold
    store.remove(victims)
    assert(store.tombstoneCount == 0L, "rebuild must truncate tombstones")
    assert(store.segmentCount == 4L, "rebuild compacts to the configured segments")
    val probe = vecOf(300L)
    val got = hits(store, probe, 10)
    assert(victims.toSet.intersect(got.toSet).isEmpty, "victims gone after rebuild")
    assert(got.contains(300L), "live self-hit survives the rebuild")
  }
}
