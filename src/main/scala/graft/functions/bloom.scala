package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomMightContain

/** Distributed Bloom filter over 64-bit hash columns — the build side
  * of scan-local membership prefilters (see [[bloom.mightContain]]).
  *
  * The build is a `treeAggregate` of per-partition bit arrays: each
  * task sets bits for its rows locally, partials OR together up a
  * 2-level tree — one pass over the data, no shuffle of the members
  * themselves, and the driver receives O(m) bits regardless of n.
  * This is what lets the member set EXCEED broadcast size: 50M grams
  * of strings won't broadcast, but their 1%-fpp bloom is ~60 MB of
  * bits and their 10%-fpp bloom ~30 MB.
  *
  * Spark's own runtime-filter injection (enabled in `Engine.session`)
  * covers the automatic case; this is the EXPLICIT form for when the
  * filter outlives one query — built once, reused across many corpus
  * scans (streaming decontamination probes every micro-batch against
  * the same benchmark bloom).
  */
object bloom {

  /** Bits for a target false-positive rate: the standard
    * `m = -n·ln(p)/ln(2)²`, rounded UP to a power of two (the probe
    * masks instead of mod-ing). */
  def bitsFor(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, s"bitsFor($n, $fpp)")
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2)))
    java.lang.Long.highestOneBit(math.max(64L, m.toLong * 2 - 1))
  }

  /** Probes for a bit budget: `k = (m/n)·ln(2)`, clamped to [1, 16]. */
  def probesFor(mBits: Long, n: Long): Int =
    math.max(1, math.min(16, math.round(mBits.toDouble / n * math.log(2)).toInt))

  /** Build the filter from a LongType hash column (one pass,
    * tree-merged partials). `mBits` must be a power of two ≥ 64.
    *
    * Partial-volume control: every partition emits an m-bit bitmap, so
    * the merge traffic is `partitions × m/8` — independent of row
    * count. The member rows are hash-only (8 B each, cheap to fold in
    * fewer, fatter tasks), so they are coalesced 4× before the
    * aggregate — a measured 4× cut of the build's shuffle volume with
    * no extra pass (coalesce is narrow). */
  def build(hashes: DataFrame, hashCol: String, mBits: Long, k: Int): Array[Byte] = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(mBits / 8 <= Int.MaxValue, s"bloom too large: $mBits bits")
    val bytes = (mBits / 8).toInt
    val rows = hashes.select(col(hashCol).cast("long")).na.drop().rdd
    val target = math.max(1, rows.getNumPartitions / 4)
    rows.coalesce(target).map(_.getLong(0))
      .treeAggregate(new Array[Byte](bytes))(
        (bits, h) => { BloomMightContain.set(h, bits, k); bits },
        (a, b) => { var i = 0; while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }; a })
  }

  /** Scan-local membership probe: true if `hash` MIGHT be in the set
    * the bits were built from (no false negatives; false positives at
    * the built fpp — re-verify survivors exactly when it matters).
    * Whole-stage-codegen, k bit tests per row. */
  def mightContain(hash: Column, bits: Array[Byte], k: Int): Column =
    BloomMightContain.bloomMightContain(hash, bits, k)
}
