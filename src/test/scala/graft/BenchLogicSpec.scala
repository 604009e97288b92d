package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic spec for the bench's load-flagging, flagged-pass retry,
  * and clean-pass headline statistic (Bench.loadedPasses /
  * Bench.needRetry / Bench.headlineMin). These decide what number the
  * official BENCH artifact reports, so they are tested deterministically
  * here instead of by racing background load against the real harness.
  */
class BenchLogicSpec extends AnyFunSuite {

  test("loadedPasses flags any pass with a calibration sample >2x the run best") {
    // pass 0 ran under load (r12's exact failure mode: 1.898 s vs 0.245 s)
    val calib = Seq((0, -1, 1.898), (0, 40, 0.300), (1, -1, 0.245), (1, 40, 0.260))
    assert(Bench.loadedPasses(calib) === Set(0))
  }

  test("loadedPasses is empty for a quiet run and for no samples") {
    assert(Bench.loadedPasses(Seq((0, -1, 0.25), (1, -1, 0.31))) === Set.empty)
    assert(Bench.loadedPasses(Nil) === Set.empty)
  }

  test("a retry pass can lower the baseline and newly flag earlier passes") {
    // both scheduled passes moderately loaded; the retry reveals true idle
    val calib = Seq((0, -1, 0.60), (1, -1, 0.55), (2, -1, 0.25))
    assert(Bench.loadedPasses(calib) === Set(0, 1))
  }

  test("needRetry requests passes until `runs` clean passes exist, bounded by budget") {
    // r12 shape: 2 passes run, pass 0 flagged -> one retry wanted
    assert(Bench.needRetry(2, 2, Set(0), retried = 0, maxRetries = 1))
    // after the (clean) retry: passes 1,2 clean -> stop
    assert(!Bench.needRetry(3, 2, Set(0), retried = 1, maxRetries = 2))
    // retry itself flagged, budget left -> keep going
    assert(Bench.needRetry(3, 2, Set(0, 2), retried = 1, maxRetries = 2))
    // budget exhausted -> stop even though still short of clean passes
    assert(!Bench.needRetry(3, 2, Set(0, 2), retried = 1, maxRetries = 1))
    // quiet run never retries
    assert(!Bench.needRetry(2, 2, Set.empty, retried = 0, maxRetries = 1))
  }

  test("headlineMin takes the min over clean-pass samples only") {
    // the loaded pass 0 sample is the smallest-looking... not here:
    // loaded samples are SLOW; min-of-all would keep 2.1, clean min is 2.3
    val ss = Seq((0, 6.9), (1, 2.3), (2, 2.5))
    assert(Bench.headlineMin(ss, flagged = Set(0)) === 2.3)
    // no flags: plain min
    assert(Bench.headlineMin(ss, flagged = Set.empty) === 2.3)
  }

  test("headlineMin falls back to min-of-all when every sample is from a flagged pass") {
    val ss = Seq((0, 6.9), (1, 5.0))
    assert(Bench.headlineMin(ss, flagged = Set(0, 1)) === 5.0)
  }
}
