package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Duplicate-SPAN dedup (d18/d19) semantics, pinned on a hand-built
  * corpus where the answers are computable by eye:
  *
  *   doc 1: "a b c d e f g h"         — shares the 7-token span
  *   doc 2: "x a b c d e f g z w"       "a b c d e f g" with doc 1
  *   doc 3: "p q r s t p q r s t"     — WITHIN-doc repeat only: its
  *                                      5-grams repeat inside doc 3
  *                                      but occur in no other doc
  *   doc 4: "m n o"                   — shorter than n, no grams
  *
  * With n = 5 the shared span contributes 3 duplicated grams per doc
  * (starts 0..2 in doc 1, 1..3 in doc 2) whose interval union covers
  * exactly the 7 shared tokens. Doc 3 must report ZERO: cross-doc
  * means min(doc)≠max(doc) over the gram key, and all its repeats are
  * self-repeats (that signal belongs to the repetition scorer, not the
  * dedup pass).
  */
class DupSpanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c d e f g h"),
    (2L, "x a b c d e f g z w"),
    (3L, "p q r s t p q r s t"),
    (4L, "m n o")
  ).toDF("doc_id", "text")

  test("dupSpanStats: interval-union coverage, within-doc repeats excluded") {
    val got = Dedup.dupSpanStats(docs, "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    assert(got === Seq(
      Row(1L, 8L, 3L, 7L, 0.875),  // grams at 0,1,2 → union [0,7) = 7 of 8
      Row(2L, 10L, 3L, 7L, 0.7),   // grams at 1,2,3 → union [1,8) = 7 of 10
      Row(3L, 10L, 0L, 0L, 0.0),   // self-repeats only: not duplicated
      Row(4L, 3L, 0L, 0L, 0.0)))   // too short for any 5-gram
  }

  test("stripDupSpans: covered tokens removed, order preserved, others intact") {
    val got = Dedup.stripDupSpans(docs, "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    assert(got === Seq(
      Row(1L, "h", 1L, 7L),
      Row(2L, "x z w", 3L, 7L),
      Row(3L, "p q r s t p q r s t", 10L, 0L),
      Row(4L, "m n o", 3L, 0L)))
  }

  test("hashGrams form ≡ string form on real data (both ops)") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").cache()
    try {
      val a = Dedup.dupSpanStats(real, "doc_id", "text", 5)
      val b = Dedup.dupSpanStats(real, "doc_id", "text", 5, hashGrams = true)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
      val c = Dedup.stripDupSpans(real, "doc_id", "text", 5)
      val d = Dedup.stripDupSpans(real, "doc_id", "text", 5, hashGrams = true)
      assert(c.exceptAll(d).isEmpty && d.exceptAll(c).isEmpty)
    } finally real.unpersist()
  }

  test("leading tab/newline: positions still align with the stripped tokens") {
    import spark.implicits._
    // Spark trim() strips spaces only — a raw split would carry a
    // phantom "" token at index 0 and shift every position; the span
    // family's cleaned tokenizer must stay aligned.
    val ws = Seq(
      (1L, "\n\ta b c d e f g h"),
      (2L, "x a b c d e f g z w \t")).toDF("doc_id", "text")
    val stats = Dedup.dupSpanStats(ws, "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    assert(stats === Seq(
      Row(1L, 8L, 3L, 7L, 0.875), Row(2L, 10L, 3L, 7L, 0.7)))
    val strip = Dedup.stripDupSpans(ws, "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    assert(strip === Seq(
      Row(1L, "h", 1L, 7L), Row(2L, "x z w", 3L, 7L)))
  }

  test("longestDupSpan: block merge, count, and zero rows") {
    val got = Dedup.longestDupSpan(docs, "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    assert(got === Seq(
      Row(1L, 8L, 1L, 7L),   // one merged block of 7 tokens
      Row(2L, 10L, 1L, 7L),
      Row(3L, 10L, 0L, 0L),
      Row(4L, 3L, 0L, 0L)))
    // two docs sharing two DISJOINT 5-grams → two blocks, longest 5
    import spark.implicits._
    val two = Seq(
      (1L, "a b c d e z z z p q r s t"),
      (2L, "a b c d e y y y p q r s t")).toDF("doc_id", "text")
    val g2 = Dedup.longestDupSpan(two, "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    assert(g2 === Seq(Row(1L, 13L, 2L, 5L), Row(2L, 13L, 2L, 5L)))
  }

  test("random corpus ≡ plain-Scala brute force (seeded)") {
    // An independent reimplementation: naive position marking, no
    // windows, no intervals — if the running-max union or the
    // cross-doc mark has an off-by-one, this diverges.
    val rnd = new scala.util.Random(42)
    val corpus = (1L to 60L).map { id =>
      val len = 3 + rnd.nextInt(20)
      // small vocab → plenty of genuine cross-doc 5-gram collisions
      (id, Seq.fill(len)("w" + rnd.nextInt(6)).mkString(" "))
    }
    val n = 5
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val gramsOf = toks.map { case (id, ts) =>
      id -> ts.sliding(n).zipWithIndex
        .filter(_._1.length == n)
        .map { case (g, p) => (g.mkString(" "), p) }.toSeq
    }.toMap
    val docsByGram = gramsOf.toSeq
      .flatMap { case (id, gs) => gs.map { case (g, _) => (g, id) } }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val expected = toks.map { case (id, ts) =>
      val dup = gramsOf(id).filter { case (g, _) => docsByGram(g) >= 2 }
      val coveredPos = dup.flatMap { case (_, p) => p until (p + n) }.toSet
      (id, ts.size.toLong, dup.size.toLong, coveredPos.size.toLong,
        BigDecimal(coveredPos.size.toDouble / ts.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = Dedup.dupSpanStats(corpus.toDF("doc_id", "text"),
        "doc_id", "text", n)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    assert(expected.exists(_._3 > 0), "vacuous: no dup spans generated")

    // d20 against the same brute force: maximal blocks == maximal runs
    // of consecutive covered positions
    val expBlocks = toks.map { case (id, ts) =>
      val covered = gramsOf(id)
        .filter { case (g, _) => docsByGram(g) >= 2 }
        .flatMap { case (_, p) => p until (p + n) }.toSet
      val runs = (0 until ts.size).foldLeft(List.empty[Int]) { (acc, p) =>
        if (!covered(p)) acc
        else if (covered.contains(p - 1)) (acc.head + 1) :: acc.tail
        else 1 :: acc
      }
      (id, ts.size.toLong, runs.size.toLong,
        if (runs.isEmpty) 0L else runs.max.toLong)
    }.toSeq.sortBy(_._1)
    val gotBlocks = Dedup.longestDupSpan(corpus.toDF("doc_id", "text"),
        "doc_id", "text", n)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(gotBlocks === expBlocks)
  }

  test("stats and strip agree: n_removed == covered_tokens per doc") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").cache()
    try {
      val joined = Dedup.dupSpanStats(real, "doc_id", "text", 5)
        .join(Dedup.stripDupSpans(real, "doc_id", "text", 5), "doc_id")
      assert(joined.filter($"n_removed" =!= $"covered_tokens").isEmpty)
      assert(joined.filter($"dup_fraction" > 0).count() > 0) // non-trivial
    } finally real.unpersist()
  }
}
