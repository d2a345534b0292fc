package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.LshPlanner

/** The S-curve band planner: analytic properties of the layout it
  * picks, not just "it returns something". */
class LshPlannerSpec extends AnyFunSuite {

  test("higher thresholds buy more rows per band") {
    val r = Seq(0.2, 0.5, 0.8, 0.95)
      .map(t => LshPlanner.plan(t, 32).rows)
    assert(r == r.sorted, s"rows per band not monotone in threshold: $r")
    assert(r.head < r.last)
  }

  test("the 50% collision point lands near (balanced) or below " +
      "(recall-biased) the requested threshold") {
    for (t <- Seq(0.3, 0.5, 0.7, 0.9); n <- Seq(32, 64, 128)) {
      val balanced = LshPlanner.plan(t, n, fnWeight = 1)
      assert(math.abs(balanced.threshold50 - t) < 0.25,
        s"plan($t, $n, 1) put the S-curve midpoint at " +
          s"${balanced.threshold50}")
      // the recall-biased default shifts the curve LEFT so pairs at
      // the threshold collide with probability comfortably above 1/2
      val biased = LshPlanner.plan(t, n)
      assert(biased.threshold50 <= t + 0.05,
        s"recall-biased plan($t, $n) midpoint ${biased.threshold50}")
      assert(biased.collisionProb(t) >= 0.45)
      assert(math.abs(biased.collisionProb(biased.threshold50) - 0.5) < 1e-9)
    }
  }

  test("collision probability is monotone and spans (0,1)") {
    val p = LshPlanner.plan(0.7, 32)
    val probs = (1 to 99).map(i => p.collisionProb(i / 100.0))
    assert(probs == probs.sorted)
    assert(probs.head < 0.01 && probs.last > 0.99)
  }

  test("fnWeight trades false negatives for candidates") {
    val recallFirst = LshPlanner.plan(0.7, 32, fnWeight = 100)
    val balanced = LshPlanner.plan(0.7, 32, fnWeight = 1)
    assert(recallFirst.falseNegMass <= balanced.falseNegMass)
    assert(recallFirst.falsePosMass >= balanced.falsePosMass)
  }

  test("the catalog's pinned d02 layout is on the planner's frontier") {
    // d02/d12 freeze (numHashes=32, bands=4 → rows=8) for threshold
    // 0.7: the planner must consider it Pareto-reasonable — no other
    // divisor split dominates it on BOTH error masses.
    val (b, r) = (4, 8)
    val all = (1 to 32).filter(32 % _ == 0).map(bb => (bb, 32 / bb))
    def m(bb: Int, rr: Int): (Double, Double) = {
      val p = LshPlanner.Plan(bb, rr, 0, 0, 0)
      val n = 2000
      var fn = 0d; var fp = 0d
      for (i <- 0 until n) {
        val s = (i + 0.5) / n
        if (s >= 0.7) fn += (1 - p.collisionProb(s)) / n
        else fp += p.collisionProb(s) / n
      }
      (fn, fp)
    }
    val (fnP, fpP) = m(b, r)
    val dominated = all.exists { case (bb, rr) =>
      val (fn2, fp2) = m(bb, rr)
      (bb, rr) != ((b, r)) && fn2 <= fnP && fp2 <= fpP &&
        (fn2 < fnP || fp2 < fpP)
    }
    assert(!dominated, "the pinned (4 bands, 8 rows) layout is dominated")
  }
}
