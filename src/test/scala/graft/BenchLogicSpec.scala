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

  test("singleCleanPass self-declares a headline resting on <2 clean passes") {
    // r14 shape: 3 passes, 0+1 loaded -> one clean pass -> declare
    assert(Bench.singleCleanPass(3, 2, Set(0, 1)))
    // every pass loaded -> the min-of-all fallback is declared too
    assert(Bench.singleCleanPass(3, 2, Set(0, 1, 2)))
    // two clean passes -> a real min -> no declaration
    assert(!Bench.singleCleanPass(3, 2, Set(0)))
    assert(!Bench.singleCleanPass(2, 2, Set.empty))
    // a deliberate single-pass dev run is not flagged (runs declares it)
    assert(!Bench.singleCleanPass(1, 1, Set.empty))
    // retries that succeed clear the flag: 5 passes, first 3 loaded
    assert(!Bench.singleCleanPass(5, 2, Set(0, 1, 2)))
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

  test("a disk-stressed pass is flagged by the IO kernel even when CPU reads clean") {
    // r13's exact hole: CPU calibration clean in every pass, but the
    // IO cycle in pass 0 ran 2.4x its idle baseline (storage
    // contention). The union flag must mark pass 0 — and needRetry
    // must then request a retry, exactly as for a CPU-flagged pass.
    val cpu = Seq((0, -1, 0.25), (0, 40, 0.26), (1, -1, 0.25), (1, 40, 0.25))
    val io = Seq((0, -1, 0.72), (0, 40, 0.65), (1, -1, 0.30), (1, 40, 0.31))
    val flagged = Bench.loadedPassesAll(Seq(cpu, io))
    assert(flagged === Set(0))
    assert(Bench.needRetry(2, 2, flagged, retried = 0, maxRetries = 1))
  }

  test("each kernel is normalized against its own baseline, not the other's") {
    // IO idle ~0.3 s vs CPU idle ~0.25 s: comparing IO samples to the
    // CPU best would flag every pass of a quiet run
    val cpu = Seq((0, -1, 0.25), (1, -1, 0.26))
    val io = Seq((0, -1, 0.30), (1, -1, 0.33))
    assert(Bench.loadedPassesAll(Seq(cpu, io)) === Set.empty)
    // and a missing kernel (read-only tmp fallback) degrades to CPU-only
    assert(Bench.loadedPassesAll(Seq(cpu, Nil)) === Set.empty)
  }

  test("remeasureSet adds high-spread queries beyond the top-N slowest") {
    // r13 shape: contrastive's samples spread [21.3, 14.9, 17.5]
    // (1.43x — below 3x here so NOT spread-flagged on its own merits;
    // plant a genuine >3x spread on a mid-cost query instead)
    val samples = Seq(
      "q_slow_a" -> Seq(10.0, 11.0),
      "q_slow_b" -> Seq(8.0, 9.0),
      "q_spready" -> Seq(1.0, 4.5), // 4.5x spread, cheap
      "q_quiet" -> Seq(0.5, 0.6))
    val (slowest, spread) = Bench.remeasureSet(samples, topN = 2, spreadFactor = 3.0)
    assert(slowest === Seq("q_slow_a", "q_slow_b"))
    assert(spread === Seq("q_spready"))
  }

  test("remeasureSet never double-selects and tolerates degenerate samples") {
    val samples = Seq(
      "q_big_spready" -> Seq(2.0, 20.0), // both slowest AND spready
      "q_one_sample" -> Seq(5.0), // spread undefined -> slowest-only path
      "q_zero" -> Seq(0.0, 1.0)) // min==0 -> no ratio, never spread-flagged
    val (slowest, spread) = Bench.remeasureSet(samples, topN = 2, spreadFactor = 3.0)
    assert(slowest === Seq("q_one_sample", "q_big_spready"))
    assert(spread === Seq.empty)
  }
}
