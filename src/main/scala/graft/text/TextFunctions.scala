package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization stats, quality scoring, language ID,
  * fingerprinting. All are pure projections built from Spark's
  * codegen'd collection/regex expressions — no UDFs, no shuffles —
  * so they stream through a scan at full width and scale linearly to
  * arbitrary corpus size.
  */
object TextFunctions {

  /** Whitespace tokens of a document (lowercased). */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword count: runs of word chars split at letter/digit
    * boundaries plus standalone punctuation — a cheap, deterministic
    * proxy for tokenizer load (no external vocab). */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Punctuation characters per character of text. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(regexp_count(text, lit("[.,;:!?]")).cast("double") / length(text))

  /** Fraction of tokens found in the given stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(stops, t))).cast("double")
        / size(toks))
  }

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

  /** Composite [0,1] quality score: length sweet-spot, moderate
    * punctuation, nonzero stopword mass, plausible word lengths.
    * Heuristic weights; each term is deterministic and documented. */
  def qualityScore(text: Column,
                   stopwords: Seq[String] = EnglishStopwords): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punct = punctRatio(text)
    val punctScore = when(punct > 0.2, 0.0).otherwise(lit(1.0) - punct / 0.2)
    val stopScore = least(stopwordRatio(text, stopwords) * 4.0, lit(1.0))
    val mwl = meanTokenLength(text)
    val wordScore = when(mwl >= 3.0 && mwl <= 8.0, 1.0).otherwise(0.5)
    round((lenScore + punctScore + stopScore + wordScore) / 4.0, 4)
  }

  /** Language marker lexicons for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: the operator's shape (per-language
    * token scoring + argmax) is the point, not lexical coverage. */
  val LanguageMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  /** Marker-token count for one language. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(array(markers.map(lit): _*), t)))

  /** Heuristic language ID: argmax of marker hits with deterministic
    * first-listed-wins tie-break; "und" (undetermined) when nothing hits. */
  def langId(text: Column): Column = {
    val hits = LanguageMarkers.map { case (l, m) => l -> markerHits(text, m) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und"): Column) { case ((l, h), els) =>
      when(h === best && best > 0, lit(l)).otherwise(els)
    }
  }

  /** Canonical-form content fingerprint: md5 of
    * lowercased, whitespace-collapsed text. Stable across engines
    * (md5 is standard), used for exact near-canonical dedup. */
  def fingerprint(text: Column): Column =
    md5(to_binary(lower(regexp_replace(trim(text), "\\s+", " ")), lit("utf-8")))

  /** Word n-gram shingles (distinct). Documents shorter than n words
    * collapse to a single whole-document shingle.
    *
    * n ≥ 2 extracts overlapping n-grams with one regex pass (a
    * lookahead capture at each token start over whitespace-normalized
    * text) instead of a per-element `transform` lambda — the
    * interpreted-HOF formulation measured ~1 ms/doc (5.7 s for 5k
    * docs); the regex path is one codegen-resident expression.
    * Equivalence with the lambda formulation is spec-asserted. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    if (n == 1) array_distinct(toks)
    else {
      val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
      val pat = "(?:^|(?<= ))(?=((?:\\S+ ){" + (n - 1) + "}\\S+))"
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(array_distinct(regexp_extract_all(norm, lit(pat), lit(1))))
    }
  }

  /** Winnowing-style rolling sketch: the k smallest shingle hashes —
    * a compact document signature for containment/overlap checks. */
  def minKSketch(text: Column, n: Int, k: Int): Column =
    slice(array_sort(transform(shingles(text, n), s => xxhash64(s))), 1, k)

  /** Word n-gram shingles WITH duplicates — the multiset [[shingles]]
    * deduplicates. Repetition statistics need every occurrence;
    * documents shorter than n words yield an EMPTY array (no n-gram
    * exists — unlike [[shingles]]' whole-document collapse, which is a
    * signature convention, not an occurrence count). Same single-pass
    * lookahead regex as [[shingles]]. */
  def allShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // n == 1 must honor the same empty-document contract: split("")
    // yields [""] (one empty token), which is NOT a 1-gram occurrence.
    if (n == 1)
      when(size(toks) === 1 && element_at(toks, 1) === "",
        array().cast("array<string>")).otherwise(toks)
    else {
      val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
      val pat = "(?:^|(?<= ))(?=((?:\\S+ ){" + (n - 1) + "}\\S+))"
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(regexp_extract_all(norm, lit(pat), lit(1)))
    }
  }

  /** Occurrence statistics of a string multiset, computed ROW-LOCALLY:
    * `struct(n, n_distinct, top_cnt, top_len, dup_occ, dup_chars,
    * tot_chars)` where `top` is the most frequent element (ties broken
    * by ascending binary element order — deterministic and engine-
    * mirrorable), `dup_occ` counts occurrences of elements seen ≥ 2
    * times (ALL of them, the Rae et al. 2021 "characters in duplicate
    * n-grams" convention), `dup_chars` their summed char lengths,
    * `tot_chars` the summed char length of every occurrence.
    *
    * Per-document repetition metrics must never leave the row — the
    * explode → groupBy(doc, elem) → re-group formulation shuffles the
    * full token stream twice, which at corpus scale is the single
    * largest exchange in the pipeline. The implementation is a native
    * sorted-run-scan expression ([[graft.text.RepetitionKernel
    * .multisetStats]]) that stays inside whole-stage codegen; the
    * sort_array + aggregate-lambda formulation it replaces is
    * CodegenFallback and measured 10-20× slower end-to-end (t23 at
    * sf0.1: 26 s → sub-second with the single-pass sibling).
    * Equivalence with the exploded formulation is spec-asserted
    * (GopherRepetitionSpec). */
  def multisetStats(arr: Column): Column =
    org.apache.spark.sql.graft.StringMultisetStats.multisetStats(arr)

  /** Single-pass native form of the four Gopher repetition metrics
    * over WHITESPACE-NORMALIZED text (`regexp_replace(lower(trim(t)),
    * '\s+', ' ')`): struct(top2_cnt, top2_len, top3_cnt, top3_len,
    * top4_cnt, top4_len, dup5_chars, tot_chars). One tokenize, grams
    * as contiguous byte ranges (no per-gram strings) — the t23 hot
    * path. */
  def repetitionStats(normText: Column): Column =
    org.apache.spark.sql.graft.RepetitionStats.repetitionStats(normText)

  /** Fraction of normalized-text characters covered by the single most
    * frequent word n-gram (count × gram length / normalized length) —
    * the Rae et al. 2021 (Gopher) `top_n_gram` repetition filter.
    * Ties: lexicographically smallest gram among the argmax (the
    * sorted-run scan can only be beaten by a STRICTLY longer run). */
  def topNgramCharFrac(text: Column, n: Int): Column = {
    val st = multisetStats(allShingles(text, n))
    val tot = length(regexp_replace(lower(trim(text)), "\\s+", " "))
    when(tot === 0 || st.getField("n") === 0, 0.0).otherwise(
      st.getField("top_cnt").cast("double") * st.getField("top_len") / tot)
  }

  /** Fraction of normalized-text characters inside word n-grams that
    * occur more than once (ALL occurrences counted, overlaps not
    * deduplicated — capped at 1.0), the Gopher `dup_n_gram` filter. */
  def dupNgramCharFrac(text: Column, n: Int): Column = {
    val st = multisetStats(allShingles(text, n))
    val tot = length(regexp_replace(lower(trim(text)), "\\s+", " "))
    when(tot === 0 || st.getField("n") === 0, 0.0).otherwise(
      least(lit(1.0), st.getField("dup_chars").cast("double") / tot))
  }

  /** The scrub stage of a training-data pipeline: sensitive-token
    * patterns applied IN ORDER, each replacing on the previous step's
    * output (so a digit run inside an already-masked email is not
    * double-counted). All regexp built-ins — codegen'd, scan-local,
    * shuffle-free; the patterns use only RE2-safe syntax so the DuckDB
    * oracle applies the identical automata. */
  val RedactPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "hex_id" -> "\\b[0-9a-fA-F]{16,}\\b",
    "digit_run" -> "[0-9]{6,}")

  /** (redacted_text, n_redactions) as a struct — replacement and the
    * per-step counts share the stepwise texts, so the two are always
    * consistent. */
  def redact(text: Column, mask: String = "[REDACTED]"): Column = {
    val (finalText, n) = RedactPatterns.foldLeft((text, lit(0L))) {
      case ((t, acc), (_, p)) =>
        (regexp_replace(t, p, mask), acc + regexp_count(t, lit(p)))
    }
    struct(finalText.as("redacted"), n.as("n_redacted"))
  }

  /** Deterministic bucket in [0, buckets) from any column — the
    * engine-portable primitive behind reproducible sampling and
    * train/val/test splits (derived from md5, which every engine
    * implements identically; xxhash64 would not be mirrorable). */
  def md5Bucket(c: Column, buckets: Int): Column = {
    val h = md5(c.cast("string").cast("binary"))
    (ascii(substring(h, 1, 1)) * 1000 + ascii(substring(h, 2, 1)) * 100 +
      ascii(substring(h, 3, 1)) * 10 + ascii(substring(h, 4, 1))) % buckets
  }

  /** Reproducible train/val/test split assignment by key hash:
    * [0,train) → "train", [train,train+val) → "val", rest → "test"
    * of a 100-bucket space. The split is a pure function of the key —
    * stable across runs, engines, and repartitioning. */
  def hashSplit(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = md5Bucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }
}
