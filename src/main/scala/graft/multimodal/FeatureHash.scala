package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.Platform

/** REAL content featurization: signed feature hashing (the "hashing
  * trick", Weinberger et al., ICML 2009 — the fastText / Vowpal-Wabbit
  * bucket scheme) over sliding byte n-grams, L2-normalized. Unlike
  * [[Multimodal.features]] (the md5 STUB kept oracle-portable for
  * m01), this is a real shallow embedding family: identical bytes map
  * to identical vectors, near-identical bytes to high-cosine vectors,
  * unrelated bytes to near-orthogonal ones — enough to drive
  * content-level dedup and similarity over binary assets without any
  * model weights, and the exact shape a learned-model swap-in keeps
  * (binary → fixed-width float vector, row-local, codegen).
  *
  * Hash convention matches the repo's signature kernels
  * ([[graft.dedup.SigHashes]]): XXH64 seed 42 — here over the raw
  * byte window, since assets are opaque binary, not UTF-8 tokens.
  * Each window votes ±1 (sign bit = bit 0 of the hash) into bucket
  * `(h >>> 1) mod dim` — the signed variant keeps the inner product
  * an unbiased kernel estimate. Content shorter than `n` hashes as a
  * single whole-content window so tiny assets still embed.
  */
object FeatureHash {

  /** dim-width L2-normalized signed-hash embedding of `bytes` over
    * sliding `n`-byte windows. Deterministic; never null; the zero
    * vector only for empty content. */
  def embed(bytes: Array[Byte], dim: Int, n: Int): GenericArrayData = {
    val acc = new Array[Double](dim)
    val len = bytes.length
    if (len >= n && n > 0) {
      var i = 0
      val last = len - n
      while (i <= last) {
        vote(acc, XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + i, n, 42L), dim)
        i += 1
      }
    } else if (len > 0) {
      vote(acc, XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET, len, 42L), dim)
    }
    var s = 0.0
    var j = 0
    while (j < dim) { s += acc(j) * acc(j); j += 1 }
    val inv = if (s > 0) 1.0 / math.sqrt(s) else 0.0
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    new GenericArrayData(out)
  }

  @inline private def vote(acc: Array[Double], h: Long, dim: Int): Unit = {
    val b = ((h >>> 1) % dim).toInt
    acc(b) += (if ((h & 1L) == 0L) 1.0 else -1.0)
  }
}
