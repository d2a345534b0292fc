package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) sketch as a typed `Aggregator`: keeps the k
  * smallest xxhash64 values of the inputs per group.
  *
  * Properties that make it right for cluster-scale pipelines:
  *  - commutative + associative merge → identical results under any
  *    partitioning, shuffle order, or AQE re-plan (same discipline as
  *    [[graft.functions.money]]);
  *  - fixed size k per group regardless of input cardinality — a
  *    bounded-memory distinct sketch;
  *  - two sketches support distinct-count estimation
  *    (`(k-1) / normalize(kth smallest)`) and Jaccard-overlap
  *    estimation between groups without re-reading the data — the
  *    corpus-level companion to the per-document MinHash signatures in
  *    [[graft.dedup.Dedup]].
  *
  * Usage (typed):
  *   ds.groupByKey(_.key).agg(BottomKSketch.of[String](64).toColumn)
  * or untyped via `udaf`: see [[BottomKSketch.register]].
  */
class BottomKSketch[IN](k: Int, hashOf: IN => Long)
    extends Aggregator[IN, java.util.TreeSet[java.lang.Long], Array[Long]]
    with Serializable {

  // sorted set of at most k smallest DISTINCT hashes: O(log k) insert
  // with dedup built in (the earlier max-heap needed an O(k) scan per
  // insert to reject duplicates — O(n·k) per group). java.util.TreeSet
  // because Kryo round-trips it natively; the Scala TreeSet drops its
  // Ordering in (de)serialization.
  override def zero: java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(set: java.util.TreeSet[java.lang.Long],
                     h: Long): java.util.TreeSet[java.lang.Long] = {
    if (set.size < k) set.add(h) // no-op if already present
    else if (h < set.last && !set.contains(h)) {
      set.pollLast(); set.add(h)
    }
    set
  }

  override def reduce(b: java.util.TreeSet[java.lang.Long],
                      a: IN): java.util.TreeSet[java.lang.Long] =
    insert(b, hashOf(a))

  override def merge(x: java.util.TreeSet[java.lang.Long],
                     y: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = y.iterator()
    while (it.hasNext) insert(x, it.next())
    x
  }

  /** Sorted ascending — canonical form, directly comparable. */
  override def finish(set: java.util.TreeSet[java.lang.Long]): Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  override def bufferEncoder: Encoder[java.util.TreeSet[java.lang.Long]] =
    Encoders.kryo[java.util.TreeSet[java.lang.Long]]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BottomKSketch {

  /** 32-bit Murmur3 widened to a non-negative long — deterministic
    * across JVMs and partitions. */
  private def hash32(bytes: Array[Byte]): Long =
    org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42).toLong & 0xffffffffL

  /** Sketch over string values. */
  def ofString(k: Int): BottomKSketch[String] =
    new BottomKSketch[String](k, s => hash32(s.getBytes("UTF-8")))

  /** Sketch over long keys. */
  def ofLong(k: Int): BottomKSketch[Long] =
    new BottomKSketch[Long](k, l => hash32(BigInt(l).toByteArray))

  /** Sketch over long keys with a 64-bit hash (xxhash64): collision
    * probability ~n²/2⁶⁵, so in the under-capacity regime (distinct
    * < k) the sketch length IS the exact distinct count and two
    * sketches intersect exactly like the underlying key sets — the
    * mode q64 runs in, where the DuckDB oracle checks it against
    * COUNT(DISTINCT) and exact set overlap. */
  def ofLongX64(k: Int): BottomKSketch[Long] =
    new BottomKSketch[Long](k,
      l => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(l, 42L))

  /** Distinct-count estimate from a sketch (standard KMV estimator).
    * Exact when the group had fewer than k distinct values. */
  def estimateDistinct(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / (sketch.last.toDouble / 0xffffffffL.toDouble)

  /** Jaccard estimate between two groups from their sketches. */
  def estimateJaccard(a: Array[Long], b: Array[Long], k: Int): Double = {
    val union = (a ++ b).distinct.sorted.take(k)
    if (union.isEmpty) 0.0
    else {
      val sa = a.toSet; val sb = b.toSet
      union.count(h => sa.contains(h) && sb.contains(h)).toDouble / union.length
    }
  }

  /** Register the string sketch as an untyped SQL aggregate. */
  def register(spark: org.apache.spark.sql.SparkSession,
               name: String = "bottom_k_sketch", k: Int = 64): Unit =
    spark.udf.register(name,
      org.apache.spark.sql.functions.udaf(ofString(k), Encoders.STRING))
}
