package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stall heuristic ([[Bench.stalled]]) gates BOTH the re-run
  * pass and the reported "stalls" count — pin its boundary semantics so
  * a tweak can't silently stop re-running what it reports (or vice
  * versa).
  */
class BenchStallSpec extends AnyFunSuite {

  test("wide relative AND absolute spread trips the heuristic") {
    assert(Bench.stalled(Seq(0.5, 0.6, 2.0)))   // 4x and +1.5 s
    assert(Bench.stalled(Seq(2.0, 0.5, 0.6)))   // order-free (sorts)
  }

  test("micro-query jitter never counts: relative-only spread stays quiet") {
    assert(!Bench.stalled(Seq(0.05, 0.06, 0.3))) // 6x but only +0.25 s
  }

  test("absolute-only spread stays quiet: a slow query wobbling under 3x") {
    assert(!Bench.stalled(Seq(3.0, 4.0, 6.0)))   // +3 s but exactly 2x
  }

  test("boundary: exactly 3x is NOT a stall (strictly greater required)") {
    assert(!Bench.stalled(Seq(1.0, 1.5, 3.0)))
    assert(Bench.stalled(Seq(1.0, 1.5, 3.01)))
  }

  test("degenerate inputs: empty and single-sample spreads never trip") {
    assert(!Bench.stalled(Nil))
    assert(!Bench.stalled(Seq(5.0)))
  }

  // ---- calibration factor ([[Bench.calibFactor]]): the normalization
  // the artifact's headline34_cal divides by — pin that it is the MEDIAN
  // probe ratio (one contended checkpoint cannot move it) and that a
  // quiet window reads ~1.
  test("calibFactor: quiet probes at the bases read 1.0") {
    val f = Bench.calibFactor(
      Seq.fill(3)(Bench.CpuCalibBase), Seq.fill(3)(Bench.ShuffleCalibBase),
      Seq.fill(3)(Bench.TextCalibBase), Seq.fill(3)(Bench.OverheadCalibBase))
    assert(math.abs(f - 1.0) < 1e-9)
  }

  test("calibFactor: uniform 2x host drift reads 2.0") {
    val f = Bench.calibFactor(
      Seq.fill(3)(Bench.CpuCalibBase * 2), Seq.fill(3)(Bench.ShuffleCalibBase * 2),
      Seq.fill(3)(Bench.TextCalibBase * 2), Seq.fill(3)(Bench.OverheadCalibBase * 2))
    assert(math.abs(f - 2.0) < 1e-9)
  }

  test("calibFactor: one contended checkpoint of twelve cannot move the median") {
    val f = Bench.calibFactor(
      Seq(Bench.CpuCalibBase, Bench.CpuCalibBase, Bench.CpuCalibBase * 40),
      Seq.fill(3)(Bench.ShuffleCalibBase), Seq.fill(3)(Bench.TextCalibBase),
      Seq.fill(3)(Bench.OverheadCalibBase))
    assert(math.abs(f - 1.0) < 1e-9)
  }

  test("calibFactor: degenerate empty input reads 1.0") {
    assert(Bench.calibFactor(Nil, Nil, Nil, Nil) == 1.0)
  }

  test("calibFamilies: a class-specific 2x drift shows ONLY in its family") {
    // The adjudication contract: a DP/branchy-class drift must be
    // attributable to the text family without rescaling the overall
    // factor past the median of the other quiet families.
    val (fc, fs, ft, fo) = Bench.calibFamilies(
      Seq.fill(3)(Bench.CpuCalibBase), Seq.fill(3)(Bench.ShuffleCalibBase),
      Seq.fill(3)(Bench.TextCalibBase * 2), Seq.fill(3)(Bench.OverheadCalibBase))
    assert(math.abs(fc - 1.0) < 1e-9 && math.abs(fs - 1.0) < 1e-9 &&
      math.abs(ft - 2.0) < 1e-9 && math.abs(fo - 1.0) < 1e-9)
    val overall = Bench.calibFactor(
      Seq.fill(3)(Bench.CpuCalibBase), Seq.fill(3)(Bench.ShuffleCalibBase),
      Seq.fill(3)(Bench.TextCalibBase * 2), Seq.fill(3)(Bench.OverheadCalibBase))
    assert(math.abs(overall - 1.0) < 1e-9,
      "a one-family drift must not rescale the overall factor")
  }

  test("calibFamilies: r16's drift class — overhead-only 2x is attributable") {
    // The r16 failure mode this family exists for: every kernel probe
    // quiet, the headline +23% on sub-second queries. factor_overhead
    // must read the drift while the other three stay 1.0 (and the
    // overall median stays quiet — one family of four never moves it).
    val (fc, fs, ft, fo) = Bench.calibFamilies(
      Seq.fill(3)(Bench.CpuCalibBase), Seq.fill(3)(Bench.ShuffleCalibBase),
      Seq.fill(3)(Bench.TextCalibBase), Seq.fill(3)(Bench.OverheadCalibBase * 2))
    assert(math.abs(fc - 1.0) < 1e-9 && math.abs(fs - 1.0) < 1e-9 &&
      math.abs(ft - 1.0) < 1e-9 && math.abs(fo - 2.0) < 1e-9)
  }
}
