package graft.store

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSuite

/** Compaction (OPTIMIZE analog) + min/max data-skipping reads. */
class CompactionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def freshStore() =
    new DocumentStore(spark, Files.createTempDirectory("graft-compact").toString)

  // 600 rows, partition = bucket (3 values), id clustered by bucket so
  // min/max stats carve the id space cleanly per partition
  private def fragmented(s: DocumentStore): Unit = {
    val df = spark.range(600)
      .select($"id", ($"id" / 200).cast("long").as("bucket"),
        concat(lit("row"), $"id").as("payload"))
      .repartition(8) // each partition dir lands ~8 files
    s.create("t", df, partitionCol = Some("bucket"))
  }

  test("compact merges fragmented partitions and preserves every row") {
    val s = freshStore()
    fragmented(s)
    val before = s.fileStats("t")
    assert(before.forall(_._2 > 1), s"fixture not fragmented: $before")
    val rowsBefore = s.read("t").orderBy("id").as[(Long, Long, String)].collect().toSeq

    assert(s.compact("t"))
    val after = s.fileStats("t")
    // tiny partitions, huge maxFileBytes => exactly one file each
    assert(after.forall(_._2 == 1), s"still fragmented: $after")
    assert(s.read("t").orderBy("id").as[(Long, Long, String)].collect().toSeq == rowsBefore)
    assert(s.version("t") == 2) // compaction is a committed version
    // pre-compaction layout stays time-travelable
    assert(s.readVersion("t", 1).count() == 600)
  }

  test("compact is a no-op when nothing is fragmented") {
    val s = freshStore()
    fragmented(s)
    assert(s.compact("t"))
    val v = s.version("t")
    assert(!s.compact("t")) // already ideal: no new version
    assert(s.version("t") == v)
  }

  test("compact splits by slot when a partition exceeds maxFileBytes") {
    val s = freshStore()
    fragmented(s)
    val before = s.fileStats("t").map { case (k, _, bytes) => k -> bytes }.toMap
    // target ~4 files per partition: ideal (≈4) < current (≈8) so every
    // partition is a victim, yet > 1 so the rewrite must salt into slots
    val mfb = before.values.min / 4
    assert(s.compact("t", maxFileBytes = mfb))
    s.fileStats("t").foreach { case (part, n, _) =>
      val slots = math.max(1, math.ceil(before(part).toDouble / mfb).toInt)
      assert(n > 1, s"$part should be salted into multiple files")
      assert(n <= slots, s"$part: $n files vs $slots slots")
    }
    assert(s.read("t").count() == 600)
  }

  test("analyze + readRange prunes partitions and matches the full-scan filter") {
    val s = freshStore()
    fragmented(s)
    s.analyze("t", Seq("id"))
    val (kept, total) = s.statsPrunedParts("t", "id", 50L, 250L)
    assert(total == 3 && kept.size == 2, s"kept $kept of $total") // buckets 0,1 only
    val got = s.readRange("t", "id", 50L, 250L)
      .orderBy("id").as[(Long, Long, String)].collect().toSeq
    val want = s.read("t").filter($"id" >= 50 && $"id" <= 250)
      .orderBy("id").as[(Long, Long, String)].collect().toSeq
    assert(got == want && got.size == 201)
  }

  test("readRange without stats falls back to the full partition set, still exact") {
    val s = freshStore()
    fragmented(s) // no analyze
    val (kept, total) = s.statsPrunedParts("t", "id", 50L, 250L)
    assert(kept.size == total) // no evidence -> no pruning
    assert(s.readRange("t", "id", 50L, 250L).count() == 201)
  }

  test("stats go stale-safe after a mutation: fallback, never wrong") {
    val s = freshStore()
    fragmented(s)
    s.analyze("t", Seq("id"))
    // move a row's id ACROSS the range boundary: stale stats would lie
    s.upsert("t", Seq((1000L, 2L, "moved")).toDF("id", "bucket", "payload"), Seq("payload"))
    val (kept, total) = s.statsPrunedParts("t", "id", 50L, 250L)
    assert(kept.size == total) // new version has no stats -> keep all
    assert(s.readRange("t", "id", 50L, 250L).count() == 201)
    // re-analyze restores pruning on the new version
    s.analyze("t", Seq("id"))
    assert(s.statsPrunedParts("t", "id", 50L, 250L)._1.size < total)
  }
}
