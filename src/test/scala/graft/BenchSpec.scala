package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's measurement arithmetic (VERDICT r17 №5 + №4):
  * the adaptive-rep trigger must fire on exactly the two-rep-stall
  * signature (median dragged >2x above an in-band minimum) and on
  * nothing else — a real regression moves every rep together, so it
  * must NEVER trigger extra reps that could average it away. Pure
  * functions, no SparkSession.
  */
class BenchSpec extends AnyFunSuite {

  test("median is the true median for odd, even, and singleton rep counts") {
    assert(Bench.median(Seq(3.0)) === 3.0)
    assert(Bench.median(Seq(1.0, 9.0)) === 5.0)
    assert(Bench.median(Seq(9.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 9.0)) === 3.0)
  }

  test("extraRepNeeded fires on the q85-shaped two-rep stall and stops at maxReps") {
    // the official r17 q85 spread: min in-band, two reps in one sticky
    // window — the median itself flags, so more reps are warranted
    val q85 = Seq(6.473, 28.118, 28.895)
    assert(Bench.extraRepNeeded(q85, maxReps = 5))
    // after one extra in-band rep the median is still stalled-dominated
    assert(Bench.extraRepNeeded(q85 :+ 6.6, maxReps = 5))
    // the 5-rep ceiling is hard: never a 6th
    assert(!Bench.extraRepNeeded(q85 ++ Seq(6.6, 6.5), maxReps = 5))
  }

  test("extraRepNeeded never fires on a uniform regression (med ~ min) or a single stalled rep") {
    // a real 2x regression: every rep moved together — med == min, no
    // extra reps, nothing to average the regression away with
    assert(!Bench.extraRepNeeded(Seq(11.2, 11.5, 11.4), maxReps = 5))
    // ONE stalled rep: the median of 3 already absorbs it
    assert(!Bench.extraRepNeeded(Seq(5.0, 5.2, 22.0), maxReps = 5))
    // fewer than two runs: min/median are the same reading
    assert(!Bench.extraRepNeeded(Seq(5.0), maxReps = 5))
    assert(!Bench.extraRepNeeded(Nil, maxReps = 5))
  }

  test("extraRepNeeded boundary: exactly 2x is in-band, just above is not") {
    assert(!Bench.extraRepNeeded(Seq(1.0, 2.0, 2.0), maxReps = 5))
    assert(Bench.extraRepNeeded(Seq(1.0, 2.01, 2.01), maxReps = 5))
  }

  test("iowaitPct is the windowed share and is zero-safe on clock weirdness") {
    val a = Bench.HostStat(1.0, iowaitJiffies = 100L, totalJiffies = 10000L)
    val b = Bench.HostStat(2.0, iowaitJiffies = 300L, totalJiffies = 11000L)
    assert(math.abs(Bench.iowaitPct(a, b) - 20.0) < 1e-9)
    // no elapsed jiffies (or a counter reset going backwards): 0, not NaN
    assert(Bench.iowaitPct(a, a) === 0.0)
    assert(Bench.iowaitPct(b, a) === 0.0)
  }

  test("sampleHost reads live /proc on Linux (non-negative, monotone totals) and never throws") {
    val s1 = Bench.sampleHost()
    val s2 = Bench.sampleHost()
    assert(s1.load1 >= 0.0 && s1.iowaitJiffies >= 0L && s1.totalJiffies >= 0L)
    assert(s2.totalJiffies >= s1.totalJiffies)
  }
}
