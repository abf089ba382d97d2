package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contamination defenses, pinned: if these thresholds
  * drift, artifact-vs-artifact comparisons silently change meaning. */
class BenchStatsSpec extends AnyFunSuite {
  import BenchStats._

  test("median: odd, even, singleton") {
    assert(median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(median(Seq(7.0)) == 7.0)
  }

  test("robustMedian: 2 contaminated runs of 7 cannot move it at all") {
    val clean = Seq(1.0, 1.01, 1.02, 0.99, 0.98)
    // two contention-poisoned samples, 20x the clean value
    val poisoned = clean ++ Seq(20.0, 21.0)
    // sorted [0.98 .99 1.0 1.01 1.02 20 21] -> trim 2 -> mid = 1.01
    assert(robustMedian(poisoned) == 1.01)
    assert(robustMedian(poisoned) < 1.1)
    // 1 of 5 is likewise trimmed
    assert(robustMedian(Seq(1.0, 1.0, 1.0, 1.0, 50.0)) == 1.0)
    // 3 of 7 CAN move it — the documented breakdown point
    assert(robustMedian(Seq(1.0, 1.0, 1.0, 1.0, 20.0, 20.0, 20.0))
      == 1.0) // median of the trimmed middle three is still clean
    assert(robustMedian(Seq(1.0, 1.0, 1.0, 20.0, 20.0, 20.0, 20.0))
      == 20.0)
    // below 5 samples: plain median (no trim budget)
    assert(robustMedian(Seq(1.0, 1.0, 9.0)) == 1.0)
  }

  test("unstable: needs BOTH relative width and absolute gap") {
    assert(unstable(Seq(0.5, 1.2)))          // 2.4x and 0.7 s
    assert(!unstable(Seq(0.10, 0.35)))       // 3.5x but only 0.25 s
    assert(!unstable(Seq(10.0, 10.4)))       // 0.4 s but 1.04x
    assert(!unstable(Seq(1.0, 1.0, 1.0)))
  }

  test("divergent: one-sided 3x-and-0.3s against the prior; no prior " +
      "or zero prior never diverges") {
    val slow = Seq(1.0, 1.0, 1.0)
    assert(divergent(slow, Some(0.2)))       // 5x and +0.8 s
    assert(!divergent(slow, Some(0.5)))      // 2x: under the ratio
    assert(!divergent(Seq(0.3, 0.3), Some(0.09))) // 3.3x but +0.21 s
    // FASTER than prior is progress, not divergence
    assert(!divergent(Seq(0.1, 0.1), Some(5.0)))
    assert(!divergent(slow, None))
    assert(!divergent(slow, Some(0.0)))
    assert(!divergent(slow, Some(-1.0)))
  }

  test("effective: measured samples win; warmup only as a fallback") {
    assert(effective(Some(2.0), Seq(1.0, 1.1)) == Seq(1.0, 1.1))
    assert(effective(Some(2.0), Nil) == Seq(2.0))
    assert(effective(None, Nil) == Nil)
    assert(effective(None, Seq(0.5)) == Seq(0.5))
  }
}
