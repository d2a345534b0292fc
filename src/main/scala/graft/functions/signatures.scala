package graft.functions

import org.apache.spark.sql.Column

/** Public column API over the native row-local signature kernels
  * (implementation under org.apache.spark.sql.graft — see the note
  * there on why). */
object signatures {
  /** struct(shh, sig): sorted-distinct token hashes + minhash slots in
    * one pass over the text — the signature stage with zero shuffles.
    * Bit-identical to the explode+groupBy formulation (spec-pinned). */
  def minhash_signature(text: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.SignatureExprs.minhashSignature(text, numHashes)

  /** 64-bit packed SimHash in one pass over the text. */
  def simhash_packed(text: Column): Column =
    org.apache.spark.sql.graft.SignatureExprs.simhashPacked(text)

  /** 64-bit packed SimHash with the engine-portable md5-nibble token
    * hash — bit-identical to `Dedup.simhashPackedPortable`
    * (spec-pinned) and reproducible in any md5-capable engine, at
    * kernel speed. */
  def simhash_packed_md5(text: Column): Column =
    org.apache.spark.sql.graft.SignatureExprs.simhashPackedMd5(text)
}
