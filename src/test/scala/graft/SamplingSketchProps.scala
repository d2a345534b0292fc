package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.graft.BloomMightContain
import graft.functions.MinKAgg

/** Driver-side ScalaCheck properties for the round-8 kernels — the
  * parts whose correctness is pure algebra and shouldn't need a Spark
  * job to falsify: bloom set/probe duality, MinKAgg's bounded-buffer
  * merge algebra, and the A-ES priority grid. */
object SamplingSketchProps extends Properties("SamplingSketch") {

  // ---- bloom: no false negatives, ever --------------------------------
  private val genHashes = Gen.listOfN(200, Gen.long)
  private val genK = Gen.choose(1, 12)

  property("bloom members always probe true") =
    Prop.forAll(genHashes, genK) { (hs, k) =>
      val bits = new Array[Byte](256) // 2048 bits
      hs.foreach(h => BloomMightContain.set(h, bits, k))
      hs.forall(h => BloomMightContain.probe(h, bits, k))
    }

  property("empty bloom rejects everything") =
    Prop.forAll(genHashes, genK) { (hs, k) =>
      val bits = new Array[Byte](256)
      hs.forall(h => !BloomMightContain.probe(h, bits, k))
    }

  // ---- MinKAgg: merge algebra == sorted-take-k ------------------------
  // unique id per row (as in real use — the id IS the tie-break), so
  // (score, id) is a total order and sorted-take-k is well-defined
  private val genRows = Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.long))
    .map(_.zipWithIndex.map { case ((s, p), i) => (s, i.toLong, p) })
  private def refDup(rows: List[(Long, Long, Long)], k: Int) =
    rows.sortBy(t => (t._1, t._2)).take(k)

  property("MinKAgg reduce over any order == sorted take-k") =
    Prop.forAll(genRows, Gen.choose(1, 7)) { (rows, k) =>
      val agg = new MinKAgg(k)
      val folded = rows.foldLeft(agg.zero)(agg.reduce)
      agg.finish(folded) == refDup(rows, k)
    }

  property("MinKAgg merge of any split == whole fold") =
    Prop.forAll(genRows, Gen.choose(1, 7), Gen.choose(0, 100)) {
      (rows, k, cut) =>
        val agg = new MinKAgg(k)
        val (a, b) = rows.splitAt(cut % (rows.length + 1))
        val merged = agg.merge(
          a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
        val whole = rows.foldLeft(agg.zero)(agg.reduce)
        agg.finish(merged) == agg.finish(whole)
    }

  // ---- A-ES priority grid: integer division exactness -----------------
  property("priority grid divide == BigInt division (no double drift)") =
    Prop.forAll(Gen.choose(0L, (1L << 32) - 1), Gen.choose(1L, 1000000L)) {
      (u32, w) =>
        val u = (u32.toDouble + 0.5) / 4294967296.0
        val grid = math.floor(-math.log(u) * 1e9).toLong
        val got = { // the Mixture formulation: strip remainder, divide
          val r = grid % w
          ((grid - r).toDouble / w).toLong
        }
        got == (BigInt(grid) / BigInt(w)).toLong
    }
}
