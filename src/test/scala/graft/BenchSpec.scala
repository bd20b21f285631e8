package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-outlier gate keeps a per-SF best-ever-steady
  * baseline (the driver's own BENCH_r*.json artifacts persist only a
  * truncated output tail, so Bench must own its history). The
  * round-trip, the min-merge, and soft failure on junk are pinned. */
class BenchSpec extends AnyFunSuite {

  private def tmpDir() = java.nio.file.Files.createTempDirectory("benchspec").toFile

  test("baseline round-trips and min-merges (contention only inflates)") {
    val dir = tmpDir()
    val sf = "/data/sf0.1"
    assert(Bench.prevSteady(sf, dir).isEmpty)
    Bench.saveBaseline(sf, dir, Map("a" -> 2.0, "b" -> 5.0))
    assert(Bench.prevSteady(sf, dir) == Map("a" -> 2.0, "b" -> 5.0))
    // a faster 'a' lowers the floor; a slower (contended) 'b' must not raise it
    Bench.saveBaseline(sf, dir, Map("a" -> 1.5, "b" -> 50.0, "c" -> 3.0))
    assert(Bench.prevSteady(sf, dir) == Map("a" -> 1.5, "b" -> 5.0, "c" -> 3.0))
    assert(Bench.baselineFile(sf, dir).getName == "BENCH_BASELINE_sf0.1.json")
  }

  test("baselines are per-SF: a small-SF run never pollutes the big-SF floor") {
    val dir = tmpDir()
    Bench.saveBaseline("/data/sf0.01", dir, Map("a" -> 0.2))
    Bench.saveBaseline("/data/sf0.1", dir, Map("a" -> 1.0))
    assert(Bench.prevSteady("/data/sf0.01", dir) == Map("a" -> 0.2))
    assert(Bench.prevSteady("/data/sf0.1", dir) == Map("a" -> 1.0))
  }

  test("junk baseline files fail soft, and negatives are dropped") {
    val dir = tmpDir()
    val sf = "/data/sf0.1"
    java.nio.file.Files.writeString(Bench.baselineFile(sf, dir).toPath, "garbage")
    assert(Bench.prevSteady(sf, dir).isEmpty)
    Bench.saveBaseline(sf, dir, Map("ok" -> 1.0, "failed" -> -1.0))
    assert(Bench.prevSteady(sf, dir) == Map("ok" -> 1.0))
  }
}
