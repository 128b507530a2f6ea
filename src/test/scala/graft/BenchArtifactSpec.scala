package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The BENCH_FULL artifact rules, specced so they cannot regress
  * silently (r18: a filtered probe run clobbered the round's closing
  * full-suite capture and was restored by hand; the fix landed minutes
  * later, untested):
  *  1. a FILTERED (SPARK_GRAFT_ONLY) capture never touches a
  *     pre-existing artifact — byte identity asserted;
  *  2. a FULL capture does overwrite it (that is the point);
  *  3. the artifact checked into the repo is schema-complete: a median
  *     for every headline query, none failed (-1), full-precision block
  *     present — a clobbered or truncated artifact fails the suite.
  */
class BenchArtifactSpec extends AnyFunSuite {

  test("a filtered capture never overwrites a pre-existing artifact") {
    val f = Files.createTempFile("bench-full-", ".json")
    val original = """{"main":{"the round's closing artifact":true}}"""
    Files.write(f, original.getBytes("UTF-8"))
    val wrote = Bench.writeFullArtifact(f, filtered = true,
      """{"main":{"a q260 probe run":true}}""")
    assert(!wrote)
    assert(new String(Files.readAllBytes(f), "UTF-8") == original,
      "filtered capture clobbered the artifact")
    Files.delete(f)
  }

  test("a full capture does overwrite") {
    val f = Files.createTempFile("bench-full-", ".json")
    Files.write(f, "old".getBytes("UTF-8"))
    val next = """{"main":{"fresh full capture":true}}"""
    assert(Bench.writeFullArtifact(f, filtered = false, next))
    assert(new String(Files.readAllBytes(f), "UTF-8") == next)
    Files.delete(f)
  }

  test("the repo artifact is schema-complete: every headline has a real median") {
    val path = java.nio.file.Paths.get("BENCH_FULL.json")
    assume(Files.exists(path), "no BENCH_FULL.json in the working tree")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(path))
    val main = root.get("main")
    assert(main != null && main.has("queries"), "artifact missing main.queries")
    val qs = main.get("queries")
    val headlines = SparkEntry.headlineQueries
    // every CURRENT headline must have a non-null, non-failed median —
    // allowing gates newer than the artifact (they get their first
    // median at the next full capture), but never a missing OLD one
    val artifactKeys = {
      val it = qs.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result().toSet
    }
    val stale = artifactKeys.diff(headlines.toSet)
    assert(stale.isEmpty, s"artifact carries non-headline keys: $stale " +
      "(a filtered capture's subset would look like this)")
    // a full capture times ALL headlines: an artifact with under 90% of
    // the current set is a probe-run clobber, not a version skew
    assert(artifactKeys.size >= (headlines.size * 9) / 10,
      s"artifact has ${artifactKeys.size} of ${headlines.size} headline " +
        "medians — looks like a filtered capture clobbered it")
    artifactKeys.foreach { k =>
      val v = qs.get(k)
      assert(v != null && v.isNumber && v.asDouble() >= 0.0,
        s"headline $k has a null/failed median: $v")
    }
    assert(root.has("full_precision_queries"),
      "artifact missing the full-precision block")
  }
}
