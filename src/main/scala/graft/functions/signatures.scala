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
}
