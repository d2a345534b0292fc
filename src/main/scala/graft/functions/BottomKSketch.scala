package graft.functions

import scala.collection.mutable

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
    extends Aggregator[IN, mutable.PriorityQueue[Long], Array[Long]]
    with Serializable {

  // max-heap of at most k smallest hashes: O(log k) insert, O(1) worst check
  override def zero: mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long]

  private def insert(heap: mutable.PriorityQueue[Long],
                     h: Long): mutable.PriorityQueue[Long] = {
    if (heap.size < k) { if (!heap.exists(_ == h)) heap.enqueue(h) }
    else if (h < heap.head && !heap.exists(_ == h)) {
      heap.dequeue(); heap.enqueue(h)
    }
    heap
  }

  override def reduce(b: mutable.PriorityQueue[Long],
                      a: IN): mutable.PriorityQueue[Long] =
    insert(b, hashOf(a))

  override def merge(x: mutable.PriorityQueue[Long],
                     y: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] =
    y.foldLeft(x)(insert)

  /** Sorted ascending — canonical form, directly comparable. */
  override def finish(heap: mutable.PriorityQueue[Long]): Array[Long] =
    heap.toArray.sorted

  override def bufferEncoder: Encoder[mutable.PriorityQueue[Long]] =
    Encoders.kryo[mutable.PriorityQueue[Long]]
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
