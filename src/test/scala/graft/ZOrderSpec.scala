package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder
import graft.sources.TestData

/** Z-order layout: the Morton interleave must match its driver-side
  * reference bit-for-bit, and the written layout must deliver the
  * claim that justifies it — per-file min/max envelopes tight enough
  * on BOTH keys that a point predicate on either one overlaps a small
  * fraction of the files, where a linear sort prunes only its leading
  * column. */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("interleave16 matches the driver-side reference") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.tabulate(200)(_ =>
      (rnd.nextInt(1 << 16), rnd.nextInt(1 << 16)))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.interleave16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val want = pairs.map { case (a, b) => ZOrder.interleave16Ref(a, b) }
    assert(got == want)
    // interleave is a bijection on the test set: no two pairs collide
    assert(got.distinct.length == pairs.distinct.length)
  }

  test("z-ordered files have tight envelopes on BOTH keys; linear sort on one") {
    val li = TestData.table(spark, "/root/testdata/sf0.01", "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val numFiles = 64
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString

    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey",
      s"$dir/z", numFiles)
    li.repartitionByRange(numFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/linear")

    // per-file envelopes, read back exactly as a footer-stats pruner
    // would see them; key reads widen via Number so an int32/int64
    // testdata-regeneration type drift can't throw
    def envelopes(path: String) =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_partkey").as("pa"), max("l_partkey").as("pb"),
             min("l_suppkey").as("sa"), max("l_suppkey").as("sb"))
        .collect()
    def longAt(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue()

    // fraction of files whose envelope covers a point predicate,
    // averaged over a grid of probe values
    def coverage(env: Array[org.apache.spark.sql.Row],
                 lo: Int, hi: Int, probes: Seq[Long]): Double =
      probes.map { v =>
        env.count(r => longAt(r, lo) <= v && v <= longAt(r, hi)).toDouble /
          env.length
      }.sum / probes.length

    // probes from the DATA's own quantiles, not hard-coded multiples —
    // testdata regenerates between rounds and a drifted key range would
    // otherwise make coverage vacuously zero on both layouts
    def dataProbes(c: String): Seq[Long] =
      li.stat.approxQuantile(c, (0 to 9).map(i => 0.05 + i * 0.1).toArray,
        0.001).map(_.toLong).toSeq.distinct

    val (zEnv, linEnv) = (envelopes(s"$dir/z"), envelopes(s"$dir/linear"))
    val partProbes = dataProbes("l_partkey")
    val suppProbes = dataProbes("l_suppkey")
    assert(partProbes.nonEmpty && suppProbes.nonEmpty)
    val zPart = coverage(zEnv, 1, 2, partProbes)
    val zSupp = coverage(zEnv, 3, 4, suppProbes)
    val linPart = coverage(linEnv, 1, 2, partProbes)
    val linSupp = coverage(linEnv, 3, 4, suppProbes)
    info(f"point-predicate file coverage: z=(part $zPart%.3f, supp $zSupp%.3f) " +
      f"linear=(part $linPart%.3f, supp $linSupp%.3f)")

    // linear layout: leading column prunes hard, second column reads
    // everything — the failure mode z-order exists to fix
    assert(linPart <= 0.10, s"linear leading-column coverage: $linPart")
    assert(linSupp >= 0.9, s"linear second-column coverage: $linSupp")
    // z-order: BOTH columns prune to a fraction (ideal ~1/sqrt(64) =
    // 0.125; allow generous slack for tile-boundary straddle + skew)
    assert(zPart <= 0.45, s"z-order l_partkey coverage: $zPart")
    assert(zSupp <= 0.45, s"z-order l_suppkey coverage: $zSupp")

    // the layout changes bytes placement, never content
    assert(spark.read.parquet(s"$dir/z").count() == li.count())
  }
}
