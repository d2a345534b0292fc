package graft.text

import org.apache.spark.unsafe.types.UTF8String

/** Row-local BPE encode kernel: the whole 24-rank merge chain in ONE
  * pass over the document, no intermediate string allocations — the
  * kernel behind [[org.apache.spark.sql.graft.BpeExprs]]. Must stay
  * BIT-IDENTICAL to the composable replace-chain formulation
  * ([[Bpe.encode]]) — BpeSpec pins the equivalence on adversarial and
  * random inputs, and the DuckDB oracle still runs the replace chain.
  *
  * Normalization mirrors the column formulation operator-for-operator:
  * UTF8String.trim (0x20 only, like Spark's trim) → UTF8String
  * .toLowerCase (Spark's lower) → Java-regex \s+ collapse (Spark's
  * regexp_replace). Merges are applied per word in rank order; since
  * no merge pair contains a space, per-word application is equivalent
  * to the chain's whole-string passes.
  */
object BpeKernel {

  def encodePiped(text: UTF8String, mergesA: Array[String],
                  mergesB: Array[String]): UTF8String = {
    val norm = text.trim().toLowerCase.toString.replaceAll("\\s+", " ")
    val n = norm.length
    val sb = new java.lang.StringBuilder(n * 3 + 8)
    val buf = new java.util.ArrayList[String](64)
    var i = 0
    var done = n == 0
    while (!done) {
      val j = norm.indexOf(' ', i) match { case -1 => n; case k => k }
      // symbols of the word norm[i, j): one per code point, matching
      // the chain's Java-regex '(.)' char-wrapping
      buf.clear()
      var k = i
      while (k < j) {
        val cp = norm.codePointAt(k)
        val cc = Character.charCount(cp)
        buf.add(norm.substring(k, k + cc))
        k += cc
      }
      // greedy left-to-right non-overlapping merge per rank, in place
      var m = 0
      while (m < mergesA.length) {
        val a = mergesA(m); val b = mergesB(m)
        var r = 0; var w = 0
        val len = buf.size
        while (r < len) {
          if (r + 1 < len && buf.get(r) == a && buf.get(r + 1) == b) {
            buf.set(w, a + b); r += 2
          } else { buf.set(w, buf.get(r)); r += 1 }
          w += 1
        }
        while (buf.size > w) buf.remove(buf.size - 1)
        m += 1
      }
      var s = 0
      while (s < buf.size) {
        sb.append('|').append(buf.get(s)).append('|')
        s += 1
      }
      if (j < n) { sb.append("| |"); i = j + 1 } else done = true
    }
    UTF8String.fromString(sb.toString)
  }
}
