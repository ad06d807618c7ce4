package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.run.GateMath

/** The CPU regression gate's pure decision rules — pinned against the
  * MEASURED sequences that motivated each rule (BASELINE.md r13-r15
  * calibration notes), so a future edit to a bar or a ladder rung fails a
  * spec instead of silently changing what the committed artifact flags.
  */
class GateMathSpec extends AnyFunSuite {

  test("baseline: max of the last rounds' minima; zero/absent never vote") {
    assert(GateMath.baseline(Seq.empty).isEmpty)
    assert(GateMath.baseline(Seq(0.0, 0.0)).isEmpty)
    // the measured q_a4_counts lucky-floor sequence: minima 2.26/3.32
    // after a 13.74 honest round — the 3-round max keeps the honest floor
    assert(GateMath.baseline(Seq(3.32, 2.26, 13.74)).contains(13.74))
    // history shorter than the window still works
    assert(GateMath.baseline(Seq(15.24)).contains(15.24))
  }

  test("lucky-floor absorption: the measured q_a4_counts flap sequence is " +
      "quiet under the 3-round baseline, a real regression still flags") {
    // same-code rounds measured minima 13.74 -> 2.26 -> 3.32 -> 8.43;
    // under the old 1-round baseline the 8.43 draw flagged at 2.54
    val base = GateMath.baseline(Seq(3.32, 2.26, 13.74)).get
    assert(!GateMath.isFlag(base, 8.43, regime = 1.0),
      "a normal draw after two lucky floors must not flag")
    // a REAL regression sits above every prior: 13.74-era levels doubling
    assert(GateMath.isFlag(base, 2.0 * 13.74, regime = 1.0))
  }

  test("comparison ladder: gate rung first, then user, then total; zeros " +
      "fall through; the 2 cpu-s floor suppresses both sides") {
    // gate rung wins when both sides carry it
    assert(GateMath.comparison(Some(10.0), Some(13.0), Some(99.0), Some(1.0),
      Some(99.0), 1.0).contains((10.0, 13.0)))
    // off-Linux zero on the current gate falls through to user
    assert(GateMath.comparison(Some(10.0), Some(0.0), Some(8.0), Some(9.0),
      Some(99.0), 1.0).contains((8.0, 9.0)))
    // zeros on both upper rungs fall through to total CPU
    assert(GateMath.comparison(None, None, Some(0.0), Some(0.0),
      Some(30.0), 33.0).contains((30.0, 33.0)))
    // the floor: sub-2-cpu-s magnitudes are JIT/scheduler lottery (r13:
    // 8 untouched-code queries flagged at 0.5-2 cpu-s) — no comparison
    assert(GateMath.comparison(Some(1.9), Some(4.0), None, None, None, 0.0).isEmpty)
    assert(GateMath.comparison(Some(4.0), Some(1.9), None, None, None, 0.0).isEmpty)
    // no previous data at all -> nothing to compare
    assert(GateMath.comparison(None, None, None, None, None, 5.0).isEmpty)
  }

  test("regime factor: sentinel median when >=4 survive, else all-compared " +
      "median; floored at 1.0") {
    // sentinel anchor in use: the changed queries' 2x ratios don't vote
    val (r1, n1) = GateMath.regimeFactor(
      allRatios = Seq(2.0, 2.1, 2.2, 1.1, 1.0, 1.2, 0.9, 1.05),
      sentinelRatios = Seq(1.1, 1.0, 1.2, 0.9, 1.05))
    assert(n1 == 5 && r1 == 1.05)
    // too few sentinels -> fall back to the all-compared median, disclosed
    val (r2, n2) = GateMath.regimeFactor(
      allRatios = Seq(1.4, 1.5, 1.6), sentinelRatios = Seq(1.0, 1.0, 1.0))
    assert(n2 == 3 && r2 == 1.5)
    // a faster box (ratios < 1) must not loosen the absolute bar
    val (r3, _) = GateMath.regimeFactor(
      allRatios = Seq(0.5, 0.6), sentinelRatios = Seq(0.5, 0.6, 0.5, 0.6))
    assert(r3 == 1.0)
  }

  test("flag rule: needs BOTH the regime-normalized ratio bar and the " +
      "absolute-delta bar (the r15 guard)") {
    // the measured false flag: 2.26 -> 3.32 reads 1.47 but moved 1.06 cpu-s
    assert(!GateMath.isFlag(2.26, 3.32, regime = 1.0))
    // a real 1.4x on a 10 cpu-s baseline moves 4 cpu-s: flags
    assert(GateMath.isFlag(10.0, 14.0, regime = 1.0))
    // regime normalization: the same ratio under a 1.3x box regime is quiet
    assert(!GateMath.isFlag(10.0, 14.0, regime = 1.3))
    // boundary: ratio exactly at the bar does not flag (strict >)
    assert(!GateMath.isFlag(10.0, 13.0, regime = 1.0))
  }

  test("byte-twin annotation: <=1% relative is unchanged; missing or zero " +
      "sides never annotate (the flag stands)") {
    assert(GateMath.byteTwinUnchanged(Some(0.03550), Some(0.03550)))
    assert(GateMath.byteTwinUnchanged(Some(100.0), Some(100.9)))
    assert(!GateMath.byteTwinUnchanged(Some(100.0), Some(102.0)))
    assert(!GateMath.byteTwinUnchanged(None, Some(1.0)))
    assert(!GateMath.byteTwinUnchanged(Some(1.0), None))
    assert(!GateMath.byteTwinUnchanged(Some(0.0), Some(0.0)))
    // sign-symmetric relative tolerance
    assert(GateMath.byteTwinUnchanged(Some(-100.0), Some(-100.9)))
  }
}
