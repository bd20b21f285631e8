package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-outlier gate keeps a per-SF best-ever-steady
  * baseline (the driver's own BENCH_r*.json artifacts persist only a
  * truncated output tail, so Bench must own its history). Pinned
  * here: the round-trip, min-merge, the fingerprint reset (a changed
  * plan must NOT be gated against the old plan's best — that would
  * launder a genuine regression as contention), the host restart,
  * the legacy-file upgrade path, and soft failure on junk. */
class BenchSpec extends AnyFunSuite {

  private def tmpDir() = java.nio.file.Files.createTempDirectory("benchspec").toFile
  private val host = "h1/32"

  private def save(sf: String, dir: java.io.File, steady: Map[String, Double],
      fps: Map[String, String] = Map.empty, from: String = host): Seq[String] = {
    val (merged, resets) = Bench.mergeBaseline(Bench.readBaseline(sf, dir), from, steady, fps)
    Bench.saveBaseline(sf, dir, merged)
    resets
  }

  test("baseline round-trips and min-merges (contention only inflates)") {
    val dir = tmpDir()
    val sf = "/data/sf0.1"
    assert(Bench.readBaseline(sf, dir).queries.isEmpty)
    save(sf, dir, Map("a" -> 2.0, "b" -> 5.0))
    assert(Bench.readBaseline(sf, dir).queries == Map("a" -> 2.0, "b" -> 5.0))
    // a faster 'a' lowers the floor; a slower (contended) 'b' must not raise it
    save(sf, dir, Map("a" -> 1.5, "b" -> 50.0, "c" -> 3.0))
    assert(Bench.readBaseline(sf, dir).queries == Map("a" -> 1.5, "b" -> 5.0, "c" -> 3.0))
    assert(Bench.baselineFile(sf, dir).getName == "BENCH_BASELINE_sf0.1.json")
  }

  test("a changed plan fingerprint resets its floor; an unchanged one min-merges") {
    val dir = tmpDir()
    val sf = "/data/sf0.1"
    save(sf, dir, Map("a" -> 1.0, "b" -> 1.0), Map("a" -> "fpA1", "b" -> "fpB"))
    // 'a' changed plan and honestly slowed to 4.0: floor must RESET to
    // 4.0 (not keep gating against the dead plan's 1.0); 'b' unchanged
    // and contended to 9.0: floor must stay 1.0
    val resets = save(sf, dir, Map("a" -> 4.0, "b" -> 9.0), Map("a" -> "fpA2", "b" -> "fpB"))
    assert(resets == Seq("a"))
    val b = Bench.readBaseline(sf, dir)
    assert(b.queries == Map("a" -> 4.0, "b" -> 1.0))
    assert(b.fps == Map("a" -> "fpA2", "b" -> "fpB"))
    // and the stale floor is not a valid gate for the new plan even
    // before any save happens
    val floors = Bench.validFloors(
      Bench.Baseline(Some(host), Map("a" -> 1.0), Map("a" -> "fpA1")),
      host, Map("a" -> "fpA2"))
    assert(floors.isEmpty)
  }

  test("host change restarts the file and invalidates all floors") {
    val dir = tmpDir()
    val sf = "/data/sf0.1"
    save(sf, dir, Map("a" -> 1.0), Map("a" -> "fpA"), from = "fasthost/64")
    val old = Bench.readBaseline(sf, dir)
    // a slower host must not be gated by the fast host's numbers
    assert(Bench.validFloors(old, host, Map("a" -> "fpA")).isEmpty)
    save(sf, dir, Map("a" -> 6.0), Map("a" -> "fpA"))
    val b = Bench.readBaseline(sf, dir)
    assert(b.host.contains(host) && b.queries == Map("a" -> 6.0))
  }

  test("legacy files (no host, no fingerprints) gate and upgrade in place") {
    val dir = tmpDir()
    val sf = "/data/sf0.1"
    java.nio.file.Files.writeString(Bench.baselineFile(sf, dir).toPath,
      """{"queries":{"a":1.5}}""")
    val old = Bench.readBaseline(sf, dir)
    // pre-fingerprint floors stay valid (one-time upgrade path) ...
    assert(Bench.validFloors(old, host, Map("a" -> "fpA")) == Map("a" -> 1.5))
    // ... and the next save attaches host + fingerprints, min-merging
    save(sf, dir, Map("a" -> 2.5), Map("a" -> "fpA"))
    val b = Bench.readBaseline(sf, dir)
    assert(b.queries == Map("a" -> 1.5) && b.host.contains(host)
      && b.fps == Map("a" -> "fpA"))
  }

  test("baselines are per-SF: a small-SF run never pollutes the big-SF floor") {
    val dir = tmpDir()
    save("/data/sf0.01", dir, Map("a" -> 0.2))
    save("/data/sf0.1", dir, Map("a" -> 1.0))
    assert(Bench.readBaseline("/data/sf0.01", dir).queries == Map("a" -> 0.2))
    assert(Bench.readBaseline("/data/sf0.1", dir).queries == Map("a" -> 1.0))
  }

  test("junk baseline files fail soft, and negatives are dropped") {
    val dir = tmpDir()
    val sf = "/data/sf0.1"
    java.nio.file.Files.writeString(Bench.baselineFile(sf, dir).toPath, "garbage")
    assert(Bench.readBaseline(sf, dir).queries.isEmpty)
    save(sf, dir, Map("ok" -> 1.0, "failed" -> -1.0))
    assert(Bench.readBaseline(sf, dir).queries == Map("ok" -> 1.0))
  }

  test("regression gate: flags >=1.5x-and-0.2s slowdowns, worst first, skips noise") {
    val prev = Map("a" -> 1.0, "b" -> 0.1, "c" -> 2.0, "d" -> 1.0)
    val now = Seq(
      "a" -> 1.6,  // 1.6x and +0.6s -> flagged
      "b" -> 0.25, // 2.5x but +0.15s -> sub-noise, skipped
      "c" -> 8.0,  // 4x -> flagged, worst ratio first
      "d" -> 1.4,  // 1.4x -> under ratio, skipped
      "e" -> 9.0,  // no previous measurement -> skipped
      "f" -> -1.0) // failed run -> skipped
    val r = Bench.regressionsIn(prev, now)
    assert(r.map(_._1) == Seq("c", "a"))
    assert(r.head == (("c", 2.0, 8.0)))
  }

  test("plan fingerprints are stable for the same code and move with the plan") {
    val spark = SparkSpec.session
    import spark.implicits._
    val q1 = (s: org.apache.spark.sql.SparkSession) =>
      s.range(10).select(org.apache.spark.sql.functions.sum("id").as("s"))
    assert(Bench.planFingerprint(q1(spark).toDF()) == Bench.planFingerprint(q1(spark).toDF()))
    val other = spark.range(10).select(org.apache.spark.sql.functions.max("id").as("s"))
    assert(Bench.planFingerprint(q1(spark).toDF()) != Bench.planFingerprint(other.toDF()))
  }
}
