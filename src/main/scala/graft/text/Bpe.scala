package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization as engine-native column work.
  *
  * The core trick is the PIPED symbol representation: a tokenization
  * state is the flat string formed by wrapping every symbol in pipes
  * ("the" tokenized as [t, h, e] is "|t||h||e|"). Applying one BPE
  * merge (a, b) -> ab is then the literal string replace
  * "|a||b|" -> "|ab|", which is exactly left-to-right non-overlapping
  * pair replacement (the separator framing makes cross-symbol and
  * cross-word false matches impossible, and "aaa" merges to [aa, a]
  * the way greedy BPE does). Encoding a document with an M-merge
  * table is therefore M chained codegen'd StringReplace expressions —
  * scan-local, shuffle-free, no UDFs, no per-row interpreter — and
  * the SAME chain is expressible verbatim in ANSI SQL, which is what
  * makes the operator fully oracle-checkable.
  *
  * Training (`train`) is the Sennrich BPE algorithm run
  * VOCABULARY-side: pair statistics aggregate over the distinct-word
  * frequency table, never the corpus, so each of the numMerges rounds
  * is a vocab-sized groupBy plus a single-row argmax collect. At
  * 100 TB the corpus-side work is one word-count aggregation
  * (map-side combinable); Heaps' law keeps the vocabulary table
  * orders of magnitude smaller than the corpus.
  */
object Bpe {

  /** Fixed default merge table (rank-ordered), used by the t15
    * catalog entry. A LITERAL list on purpose: the DuckDB oracle
    * applies the identical chained replaces, so the whole
    * tokenization is hash-checkable. Later ranks build on earlier
    * merged symbols (th+e, in+g) the way learned BPE tables do; the
    * list itself was produced by `train` over the sf0.01 corpus and
    * then frozen here. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r", "s" -> "t",
    "m" -> "er", "a" -> "t", "l" -> "u", "a" -> "r", "p" -> "ar",
    "j" -> "o", "jo" -> "in", "a" -> "s", "as" -> "h", "h" -> "ash",
    "r" -> "ow", "at" -> "c", "atc" -> "h", "b" -> "atch", "a" -> "n",
    "c" -> "an", "s" -> "can", "c" -> "o", "c" -> "u")

  /** Lowercased, trimmed, whitespace-collapsed text — the
    * normalization both engines share.
    *
    * DOMAIN NOTE: the piped representation reserves '|' as its
    * framing character, so documents containing a literal '|' are
    * outside the encoder's domain (the frame becomes ambiguous and
    * token counts / merges silently corrupt — consistently in both
    * engines, so the oracle cannot catch it). Callers with untrusted
    * text should pass it through [[sanitize]] first; the shipped
    * corpora are pipe-free (checked). */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Strip the reserved framing character — the upstream guard for
    * text that may contain literal pipes. */
  def sanitize(text: Column): Column = translate(text, "|", "")

  /** Character-level piped start state over normalized text. Spaces
    * become their own "| |" unit; merge pairs never contain a space,
    * so merges cannot cross word boundaries by construction. */
  def piped(text: Column): Column =
    regexp_replace(normalize(text), "(.)", "|$1|")

  /** Apply a rank-ordered merge table to a piped tokenization. */
  def applyMerges(pipedCol: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(pipedCol) { case (c, (a, b)) =>
      replace(c, lit("|" + a + "||" + b + "|"), lit("|" + a + b + "|"))
    }

  /** Full encode: normalized text -> final piped tokenization, as M
    * chained codegen StringReplace expressions. The composable
    * formulation — and the one the DuckDB oracle mirrors verbatim. */
  def encode(text: Column,
             merges: Seq[(String, String)] = DefaultMerges): Column =
    applyMerges(piped(text), merges)

  /** [[encode]] as ONE native Catalyst expression: normalization and
    * the whole merge chain in a single pass over the text (kernel:
    * [[BpeKernel.encodePiped]]) instead of M intermediate document
    * copies — bit-identical output (spec-pinned), ~10× less
    * allocation. The hot-path form the catalog entries use. */
  def encodeKernel(text: Column,
                   merges: Seq[(String, String)] = DefaultMerges): Column =
    org.apache.spark.sql.graft.BpeExprs.encodePiped(text, merges)

  /** BPE token count of an encoded state: pipe chars / 2 is the total
    * unit count; the space units (one per word gap) are separators,
    * not tokens. */
  def tokenCount(encoded: Column, norm: Column): Column = {
    val units = (length(encoded) - length(replace(encoded, lit("|")))) / 2
    val gaps = length(norm) - length(replace(norm, lit(" ")))
    when(length(norm) === 0, 0L).otherwise(units - gaps).cast("long")
  }

  /** Content hash of the final tokenization — pins symbol identity
    * and order, not just the count (md5 is engine-portable). */
  def encodingHash(encoded: Column): Column =
    md5(to_binary(encoded, lit("utf-8")))

  /** Learn a BPE merge table from a corpus (Sennrich 2016, run
    * vocabulary-side). Pair counts are weighted by word frequency and
    * include overlapping occurrences, matching the reference
    * algorithm; the argmax tie-break is (count desc, pair asc) so the
    * learned table is deterministic. Each round touches only the
    * cached word-frequency table; the per-round driver transfer is
    * one row. Stops early when no pair reaches minFreq. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minFreq: Long = 2L): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(normalize(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("w"), "(.)", "|$1|").as("syms"),
              col("freq"))
      .cache()
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (merges.length < numMerges && !done) {
        // Current tokenization = frozen-so-far merges over the cached
        // base; the vocab table is small, so re-deriving it per round
        // is cheaper than managing M materializations.
        val cur = words.select(
          applyMerges(col("syms"), merges.toSeq).as("syms"), col("freq"))
        val arr = split(
          regexp_replace(col("syms"), "^\\||\\|$", ""), "\\|\\|")
        val n1 = greatest(size(col("a")) - 1, lit(0))
        val top = cur
          .select(col("freq"), arr.as("a"))
          .select(col("freq"), explode(
            zip_with(slice(col("a"), lit(1), n1), slice(col("a"), lit(2), n1),
                     (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"), col("freq"))
          .groupBy("a", "b").agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1)
          .select(col("a").cast("string"), col("b").cast("string"),
                  col("cnt").cast("long"))
          .as[(String, String, Long)]
          .collect()
        top.headOption match {
          case Some((a, b, cnt)) if cnt >= minFreq => merges += (a -> b)
          case _ => done = true
        }
      }
      merges.toSeq
    } finally { words.unpersist(); () }
  }
}
