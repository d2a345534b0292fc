package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (non-shuffle-join plans, or a
  * hot key so large one task still can't hold it).
  *
  * Mechanics: the probe side scatters each row to one of `salt`
  * sub-keys at random; the build side replicates every row across all
  * `salt` sub-keys. The join key becomes (key, salt), so a hot key's
  * rows spread over `salt` tasks instead of one straggler. For
  * probe-preserving join types each probe row still meets every
  * matching build row exactly once, so correctness is unchanged.
  * Build-preserving types (right/full outer) are rejected: an
  * unmatched build row exists once per salt sub-key, so they would
  * emit `salt` copies of it. Cost: build side inflates ×salt (use on
  * the smaller side, and only when the skew actually bites — AQE
  * first).
  */
object SkewJoin {

  /** Join types whose output rows are driven solely by the probe side. */
  private val ProbePreserving =
    Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(ProbePreserving.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin is only correct for probe-preserving join types " +
        s"(${ProbePreserving.mkString(", ")}); build-side rows are " +
        s"replicated ×salt, so '$joinType' would duplicate unmatched build rows")
    val salted = probe.withColumn("__salt",
      (pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
        .cast("int"))
    val replicated = build.withColumn("__salt",
      explode(array(Seq.tabulate(salt)(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
