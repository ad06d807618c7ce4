package graft.run

/** Pure decision rules of the bench's CPU regression gate — extracted from
  * `graft.Bench`'s main so the logic that decides what gets FLAGGED in the
  * committed artifact is unit-testable (three of the r14 advice findings
  * were comparator/pairing bugs in bench-main code no spec could reach).
  *
  * The measurements these rules are calibrated on (BASELINE.md r13-r15
  * notes): user-CPU is near-deterministic instruction work plus ADDITIVE
  * positive noise of ~1-2 cpu-s (JIT warm-up, interrupt-tick
  * misattribution); the box drifts UNIFORMLY 1.3-1.7x between same-code
  * runs; and the per-run MINIMUM of user-CPU draws is itself heavy-tailed
  * round-over-round (max/min swing up to 2.08x across three same-code r15
  * runs even above 10 cpu-s magnitudes).
  */
object GateMath {

  /** Noise floor: below this magnitude a user-CPU measurement is JIT +
    * scheduler lottery, not plan work (r13 calibration: 8 untouched-code
    * queries flagged at 0.5-2 cpu-s across two same-code runs while
    * nothing above 30 cpu-s moved). Doubles as the ABSOLUTE-DELTA bar a
    * flag's movement must clear (r15: a ratio clears 1.3 on a sub-2-cpu-s
    * movement exactly when the baseline sits near the floor). */
  val NoiseFloorCpuS = 2.0

  /** Absolute flag bar before regime normalization. */
  val FlagRatioBar = 1.3

  /** Advisory ceiling on the regime factor: past the observed 1.3-1.7
    * same-code box drift, either an extreme box episode or a UNIFORM code
    * slowdown is hiding in the median — a human must adjudicate which. */
  val RegimeWarnBar = 1.7

  /** Baseline for one name: the MAX of the last K rounds' gate minima
    * (r15, the lucky-floor fix). Same-code minima are heavy-tailed, so a
    * single round's lucky floor must not become the sole baseline: a real
    * regression exceeds ALL recent priors (they sit at the old level —
    * detection stays immediate), while a ≤K−1-round lucky floor is
    * absorbed by the older honest minima. Zero/negative entries mean "no
    * measurement" and never vote. */
  def baseline(history: Seq[Double]): Option[Double] = {
    val h = history.filter(_ > 0)
    if (h.isEmpty) None else Some(h.max)
  }

  /** The comparison ladder for one name: min-of-draws USER gate when both
    * rounds carry it, then recorded user-vs-user, then total CPU (oldest
    * artifacts). A zero on either side of a rung means the measurement
    * was unavailable there (ProcStat reads (0,0) where /proc is missing)
    * — fall through rather than silently suppressing the comparison.
    * Returns (prev, cur) of the first usable rung, floored at
    * [[NoiseFloorCpuS]] on BOTH sides. */
  def comparison(
      gateBaseline: Option[Double], curGate: Option[Double],
      prevUser: Option[Double], curUser: Option[Double],
      prevTotal: Option[Double], curTotal: Double): Option[(Double, Double)] = {
    val rung = (gateBaseline, curGate) match {
      case (Some(p), Some(c)) if p > 0 && c > 0 => Some((p, c))
      case _ => (prevUser, curUser) match {
        case (Some(p), Some(c)) if p > 0 && c > 0 => Some((p, c))
        case _ => prevTotal.map(p => (p, curTotal))
      }
    }
    rung.filter { case (p, c) => p > NoiseFloorCpuS && c > NoiseFloorCpuS }
  }

  /** Regime factor from the comparison ratios: the median over the
    * SENTINEL subset when at least `minSentinels` survived the floor
    * (r15 — sentinels are always timed and rarely touched, so their
    * median estimates pure box drift without letting a round's changed
    * queries vote on their own normalization), else the all-compared
    * median. Floored at 1.0 so a faster-box run never loosens the
    * absolute bar. Returns (factor, sentinelComparisons). */
  def regimeFactor(allRatios: Seq[Double], sentinelRatios: Seq[Double],
      minSentinels: Int = 4): (Double, Int) = {
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    val base =
      if (sentinelRatios.size >= minSentinels) median(sentinelRatios)
      else median(allRatios)
    (math.max(base, 1.0), sentinelRatios.size)
  }

  /** A comparison becomes a FLAG only when the ratio clears the
    * regime-normalized bar AND the absolute movement exceeds the additive
    * noise amplitude ([[NoiseFloorCpuS]]): a real regression on any
    * floor-admitted baseline moves >2 cpu-s at 1.3x by construction,
    * while a lucky-floor artifact's ~1 cpu-s movement cannot flag however
    * large its ratio reads. */
  def isFlag(prev: Double, cur: Double, regime: Double): Boolean =
    cur / prev > FlagRatioBar * regime && cur - prev > NoiseFloorCpuS

  /** Byte-twin self-annotation: a flagged single-draw scenario whose
    * deterministic byte-form twin is unchanged (≤ `tol` relative) vs the
    * previous artifact ran the same plan over the same volume — a
    * CPU-only movement is the box/JIT, not code. A missing side never
    * annotates (conservative: the flag stands). */
  def byteTwinUnchanged(prev: Option[Double], cur: Option[Double],
      tol: Double = 0.01): Boolean =
    (prev, cur) match {
      case (Some(p), Some(c)) if p != 0.0 => math.abs(c - p) / math.abs(p) <= tol
      case _ => false
    }
}
