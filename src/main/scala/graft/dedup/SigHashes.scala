package graft.dedup

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Row-local signature kernels — the call targets of the codegen'd
  * `minhash_signature` / `simhash_packed` expressions. These reproduce
  * the aggregation-path signatures BIT-FOR-BIT (parity spec-checked on
  * real documents) while touching each row exactly once:
  *
  *  - tokenization is the same call chain Spark's
  *    `split(lower(trim(text)), "\\s+")` makes (`UTF8String.trim` →
  *    `toLowerCase` → `split(pattern, -1)`), so token boundaries can't
  *    drift from the Column-API form;
  *  - string hashing is `XXH64.hashUTF8String(tok, 42)` — the exact
  *    kernel behind `xxhash64(col)` — and the per-slot minhash seeds
  *    chain through `XXH64.hashInt(i+1, h1)` exactly as
  *    `xxhash64(col, lit(i+1))` chains its arguments.
  *
  * Why this exists: the aggregation formulation (explode tokens →
  * groupBy doc) is the right shape when signatures feed a bucket
  * shuffle anyway, but it pays one explode + one hash-agg SHUFFLE per
  * signature table. Per-row kernels compute the same values inside the
  * scan's whole-stage loop — zero extra shuffles — which is what the
  * d02/d03 signature stages actually want (their only shuffle should
  * be the bucket join itself).
  */
object SigHashes {

  private val WhitespacePattern = UTF8String.fromString("\\s+")

  /** Same tokens as `TextFunctions.tokens` (split(lower(trim(text)),
    * "\\s+")) — by calling the same UTF8String methods the Column form
    * compiles to. */
  def tokens(text: UTF8String): Array[UTF8String] =
    text.trim().toLowerCase().split(WhitespacePattern, -1)

  /** struct(shh, sig): sorted-distinct token hashes (the exact-verify
    * set) and the `numHashes`-slot minhash signature, both over
    * DISTINCT tokens (1-gram shingles are distinct by construction).
    * Equal h1 values contribute equal slot candidates, so iterating
    * distinct hashes is exactly the aggregation's semantics. */
  def minhashRow(text: UTF8String, numHashes: Int): InternalRow = {
    val toks = tokens(text)
    val set = new java.util.TreeSet[java.lang.Long]()
    var t = 0
    while (t < toks.length) {
      set.add(XXH64.hashUTF8String(toks(t), 42L))
      t += 1
    }
    val shh = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { shh(i) = it.next(); i += 1 }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var k = 0
    while (k < shh.length) {
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashInt(s + 1, shh(k))
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(shh), new GenericArrayData(sig)))
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit packed SimHash with the PORTABLE md5-nibble token hash:
    * token bit j = bit (j%4) of hex nibble (j/4) of md5(token) —
    * `Dedup.simhashPackedPortable`'s exact convention (parity
    * spec-pinned), computed natively: one MD5 per token with the
    * nibbles read straight off the digest bytes, instead of 64
    * substring/conv lambda probes per token. Same reproducibility in
    * any engine with md5 (the DuckDB d03 oracle), at kernel speed. */
  def simhashPackedMd5(text: UTF8String): Long = {
    val toks = tokens(text)
    val counts = new Array[Int](64)
    val md = md5Digest.get()
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes)
      var j = 0
      while (j < 64) {
        val nib = j >>> 2 // hex-string char index = nibble index
        val b = d(nib >>> 1) & 0xFF
        val nibVal = if ((nib & 1) == 0) b >>> 4 else b & 0xF
        counts(j) += (if (((nibVal >>> (j & 3)) & 1) == 1) 1 else -1)
        j += 1
      }
      t += 1
    }
    var packed = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) packed |= (1L << j)
      j += 1
    }
    packed
  }

  /** 64-bit packed SimHash over ALL tokens (duplicates weigh in, as in
    * the explode-based aggregation): bit j set iff Σ_tokens
    * (±1 by bit j of xxhash64(token)) is positive. */
  def simhashPacked(text: UTF8String): Long = {
    val toks = tokens(text)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = XXH64.hashUTF8String(toks(t), 42L)
      var j = 0
      while (j < 64) {
        counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      t += 1
    }
    var packed = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) packed |= (1L << j)
      j += 1
    }
    packed
  }
}
