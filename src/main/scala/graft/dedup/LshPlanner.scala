package graft.dedup

/** Band planning for MinHash LSH (the standard S-curve analysis,
  * Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3): a
  * signature of `numHashes` values split into `b` bands of `r` rows
  * collides a pair of jaccard `s` with probability
  * `P(s) = 1 − (1 − s^r)^b`. Given a target similarity threshold,
  * choose `(bands, rows)` among the divisors of the signature budget
  * to minimize the expected error mass
  *
  *   cost = fnWeight · ∫ₜ¹ (1 − P(s)) ds  +  ∫₀ᵗ P(s) ds
  *
  * — missed true pairs above the threshold (weighted: dedup pipelines
  * fear false negatives, which silently leak duplicates, more than
  * false positives, which the exact verify stage removes at bounded
  * cost) plus spurious candidates below it.
  *
  * This is a PLANNING utility: the catalog's d02/d12 entries pin their
  * (32, 4) layout for oracle reproducibility, and the streaming
  * maintainers freeze band params per state dir — the planner is for
  * choosing those constants per deployment, not for re-deriving them
  * query-to-query (a drifting layout would break replay idempotency).
  */
object LshPlanner {

  final case class Plan(bands: Int, rows: Int, threshold50: Double,
                        falseNegMass: Double, falsePosMass: Double) {
    /** Collision probability of a pair with jaccard `s` under this
      * layout. */
    def collisionProb(s: Double): Double =
      1d - math.pow(1d - math.pow(s, rows.toDouble), bands.toDouble)
  }

  private def masses(b: Int, r: Int, t: Double): (Double, Double) = {
    // 2000-point midpoint rule; P is smooth on [0,1]
    val n = 2000
    var fn = 0d; var fp = 0d
    var i = 0
    while (i < n) {
      val s = (i + 0.5) / n
      val p = 1d - math.pow(1d - math.pow(s, r.toDouble), b.toDouble)
      if (s >= t) fn += (1d - p) / n else fp += p / n
      i += 1
    }
    (fn, fp)
  }

  /** The (bands, rows) split of `numHashes` minimizing
    * `fnWeight·FN + FP` around `threshold`. */
  def plan(threshold: Double, numHashes: Int,
           fnWeight: Double = 10d): Plan = {
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0,1), got $threshold")
    require(numHashes >= 2, s"numHashes must be >= 2, got $numHashes")
    val candidates = (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
    val best = candidates.minBy { case (b, r) =>
      val (fn, fp) = masses(b, r, threshold)
      fnWeight * fn + fp
    }
    val (fn, fp) = masses(best._1, best._2, threshold)
    Plan(best._1, best._2,
      math.pow(1d - math.pow(0.5, 1d / best._1), 1d / best._2), fn, fp)
  }
}
