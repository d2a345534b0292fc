package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static call targets for the repetition-statistics expressions
  * ([[org.apache.spark.sql.graft.TextRepetition]]) — eval and codegen
  * both call these, so parity is by construction (the ImageHeaders /
  * BpeKernel pattern).
  *
  * Why a kernel at all: the HOF formulation (`sort_array` + an
  * `aggregate` lambda with an 8-field struct state) is CodegenFallback
  * — it drops the whole projection out of whole-stage codegen, loses
  * common-subexpression elimination for the shared normalization
  * subtree, and pays an interpreted expression tree per array element.
  * Measured on t23 at sf0.1: 26–51 s; this kernel makes the same query
  * sub-second. Per-document repetition stays ROW-LOCAL either way —
  * the exploded groupBy formulation would shuffle the full gram stream
  * (equivalence with it is spec-asserted in GopherRepetitionSpec).
  */
object RepetitionKernel {

  /** memcmp of two byte ranges — the joined-gram string comparison,
    * identical to UTF8String binary order and DuckDB's ORDER BY. */
  private def compareRange(b: Array[Byte], s1: Int, e1: Int,
                           s2: Int, e2: Int): Int = {
    var i = s1; var j = s2
    while (i < e1 && j < e2) {
      val c = (b(i) & 0xff) - (b(j) & 0xff)
      if (c != 0) return c
      i += 1; j += 1
    }
    (e1 - s1) - (e2 - s2)
  }

  /** UTF-8 character count of a byte range (continuation bytes are
    * 10xxxxxx). */
  private def charLen(b: Array[Byte], s: Int, e: Int): Int = {
    var i = s; var n = 0
    while (i < e) { if ((b(i) & 0xc0) != 0x80) n += 1; i += 1 }
    n
  }

  /** Single-pass Gopher repetition statistics over WHITESPACE-
    * NORMALIZED text (single 0x20 separators, no leading/trailing
    * whitespace — the `regexp_replace(lower(trim(text)), '\s+', ' ')`
    * form every call site already holds). Tokens are then contiguous
    * slices of one byte array, so a word n-gram IS the contiguous
    * byte range from its first token's start to its last token's end:
    * gram comparison is a memcmp, no per-gram string is ever built.
    *
    * Per n ∈ {2,3,4}: the count and char length of the most frequent
    * n-gram (ties → lexicographically smallest, i.e. the first run in
    * ascending order — only a STRICTLY longer run replaces the best).
    * For n = 5: total characters across ALL occurrences of n-grams
    * seen ≥ 2 times (the Rae et al. 2021 dup-n-gram convention).
    *
    * Returns struct(top2_cnt, top2_len, top3_cnt, top3_len, top4_cnt,
    * top4_len, dup5_chars L, tot_chars). Documents with fewer than n
    * tokens contribute zeros for that n. */
  def repetitionStats(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val len = bytes.length
    // token boundaries: starts(k) .. ends(k) (byte offsets)
    var t = 0
    var i = 0
    var starts = new Array[Int](math.max(8, len / 4))
    var ends = new Array[Int](starts.length)
    while (i <= len) {
      val s = i
      while (i < len && bytes(i) != 0x20) i += 1
      if (t == starts.length) {
        starts = java.util.Arrays.copyOf(starts, t * 2)
        ends = java.util.Arrays.copyOf(ends, t * 2)
      }
      starts(t) = s; ends(t) = i; t += 1
      i += 1 // skip the separator
    }
    if (len == 0) t = 0 // empty text: no tokens, not one empty token

    val out = new Array[Any](8)
    var f = 0
    var n = 2
    while (n <= 5) {
      val m = t - n + 1
      var topCnt = 0; var topLen = 0; var dupChars = 0L
      if (m > 0) {
        val idx = new Array[Integer](m)
        var k = 0
        while (k < m) { idx(k) = Integer.valueOf(k); k += 1 }
        val nn = n
        java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
          override def compare(a: Integer, b: Integer): Int =
            compareRange(bytes, starts(a), ends(a + nn - 1),
              starts(b), ends(b + nn - 1))
        })
        // run scan over the sorted gram order
        var runStart = 0
        k = 1
        while (k <= m) {
          val boundary = k == m || compareRange(bytes,
            starts(idx(runStart)), ends(idx(runStart) + n - 1),
            starts(idx(k)), ends(idx(k) + n - 1)) != 0
          if (boundary) {
            val run = k - runStart
            val g = idx(runStart)
            if (run > topCnt) {
              topCnt = run
              topLen = charLen(bytes, starts(g), ends(g + n - 1))
            }
            if (run >= 2)
              dupChars += run.toLong * charLen(bytes, starts(g),
                ends(g + n - 1))
            runStart = k
          }
          k += 1
        }
      }
      if (n <= 4) { out(f) = topCnt; out(f + 1) = topLen; f += 2 }
      else out(f) = dupChars
      n += 1
    }
    out(7) = charLen(bytes, 0, len)
    new GenericInternalRow(out)
  }

  /** Occurrence statistics of a string multiset (array<string>):
    * struct(n, n_distinct, top_cnt, top_len, dup_occ, dup_chars L,
    * tot_chars L) — the native replacement for the interpreted
    * sort_array + aggregate-lambda formulation. Binary sort order
    * (UTF8String/memcmp); ties for top go to the smallest element.
    * Null elements are rejected with a clear error — the function is
    * public on arbitrary array<string> columns, and a silent NPE from
    * the sort comparator is not a contract. */
  def multisetStats(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    val elems = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"multisetStats: null element at index $i (array<string> input " +
            "must not contain nulls)")
      elems(i) = arr.getUTF8String(i); i += 1
    }
    java.util.Arrays.sort(elems, new java.util.Comparator[UTF8String] {
      override def compare(a: UTF8String, b: UTF8String): Int =
        a.binaryCompare(b)
    })
    var nDistinct = 0; var topCnt = 0; var topLen = 0
    var dupOcc = 0; var dupChars = 0L; var totChars = 0L
    var runStart = 0
    i = 0
    while (i < m) { totChars += elems(i).numChars(); i += 1 }
    i = 1
    while (i <= m) {
      if (i == m || elems(i).binaryCompare(elems(runStart)) != 0) {
        val run = i - runStart
        nDistinct += 1
        if (run > topCnt) { topCnt = run; topLen = elems(runStart).numChars() }
        if (run >= 2) {
          dupOcc += run
          dupChars += run.toLong * elems(runStart).numChars()
        }
        runStart = i
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      m, nDistinct, topCnt, topLen, dupOcc, dupChars, totChars))
  }
}
