package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two sort keys
  * so that range-partitioning on the combined value gives every file a
  * TIGHT min/max envelope on BOTH columns — parquet footer stats then
  * skip files for predicates on either key, where a linear sort can
  * prune only its leading column. The standard multi-dimensional
  * clustering trick for 100 TB scan layouts, as pure Column
  * expressions (shift/mask bit spreads — codegen'd, no UDF).
  *
  * Keys are quantile-bucketized before interleaving rather than
  * bit-interleaved raw: the z-curve only tiles evenly when both axes
  * are uniformly occupied, and real keys (ids, timestamps, prices)
  * are anything but. Bucket boundaries come from ONE distributed
  * Greenwald-Khanna pass per key (`approxQuantile` — no global-sort
  * window, no single-partition stage); the per-row bucket lookup is a
  * bounded fold over the small broadcast-literal boundary array,
  * which only runs on the one-off layout job.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit value: the classic mask-shift cascade, as nested Column
    * expressions (each step is a shift, an OR, and an AND — all
    * codegen'd long arithmetic). */
  private[operators] def spread16(x: Column): Column = {
    val masks = Seq(
      (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
      (1, 0x55555555L))
    masks.foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (acc, (s, m)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(m))
    }
  }

  /** Morton-interleave two 16-bit values: a's bits land on even
    * positions, b's on odd — z(a, b) as one long. */
  private[graft] def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Driver-side reference of [[interleave16]] for spec parity. */
  private[graft] def interleave16Ref(a: Int, b: Int): Long = {
    def spread(x: Int): Long = {
      var v = x.toLong & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    spread(a) | (spread(b) << 1)
  }

  /** Quantile-bucket a numeric column into `1 << bits` ranks:
    * boundaries from one distributed approxQuantile pass, the per-row
    * bucket = how many boundaries the value has passed (a fold over
    * the literal boundary array). */
  private def bucketized(df: DataFrame, c: String, bits: Int): Column = {
    val nb = (1 << bits) - 1
    val qs = df.stat.approxQuantile(
      c, (1 to nb).map(_.toDouble / (nb + 1)).toArray, 0.001)
    val arr = array(qs.map(lit): _*)
    size(filter(arr, b => b <= col(c).cast("double"))).cast("long")
  }

  /** Add a `__z` column: both keys quantile-bucketized to `bits` bits
    * (default 8 → a 256×256 tile grid), then Morton-interleaved.
    * Numeric, NON-NULL keys only (cast dates/timestamps to their epoch
    * number first; filter or impute nulls before layout). Nulls fail
    * fast here: a null key would silently bucketize to tile 0 — and
    * approxQuantile ignores nulls when drawing boundaries — so
    * null-heavy keys would skew the lowest tile's envelope and quietly
    * destroy the file-skipping the layout exists for. */
  def withZValue(df: DataFrame, colA: String, colB: String,
                 bits: Int = 8): DataFrame = {
    val nNull = df.filter(col(colA).isNull || col(colB).isNull).limit(1).count()
    require(nNull == 0,
      s"z-order keys must be non-null: found null $colA or $colB " +
        "(filter or impute before layout — null rows would co-cluster " +
        "in tile 0 and break its min/max envelope)")
    df.withColumn("__z", interleave16(
      bucketized(df, colA, bits), bucketized(df, colB, bits)))
  }

  /** Write `df` z-ordered on (colA, colB) into ≈ `numFiles` files:
    * range-partition on the z-value, sort within partitions, drop the
    * helper column. Each output file then covers a compact z-range —
    * a near-square tile region in (rank(A), rank(B)) space — so a
    * point predicate on EITHER column overlaps ~√numFiles tiles
    * instead of all of them (ZOrderSpec measures exactly this from
    * the written files' min/max envelopes). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, numFiles: Int): Unit =
    withZValue(df, colA, colB)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
