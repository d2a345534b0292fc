package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TestData
import graft.streaming.IncrementalDecontamination
import graft.text.TextFunctions

/** The d11 fuzzy-decontamination verdict as MAINTAINED state:
  * per-doc verdicts are pure and monotone under a static benchmark,
  * so each micro-batch pays only Δ × benchmark work — and the
  * accumulated flagged set must equal the one-shot batch verdict over
  * the docs seen so far at EVERY batch boundary, exactly (the
  * per-batch PPJoin rarity ranks differ from the full-corpus ranks,
  * which must not matter). */
class StreamingDecontaminationSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(containment: Boolean): Unit = {
    val tau = 0.9
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        array_distinct(TextFunctions.tokens(col("text"))).as("w"))
    val isBench = col("source").isin("src0", "src1")
    val bench = docs.filter(isBench).select("doc_id", "w").cache()
    val corpus = docs.filter(!isBench).select("doc_id", "w")
    val statePath = Files.createTempDirectory("graft-fuzzy-decon").toString

    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq

    val all = corpus.as[(Long, Seq[String])].collect().sortBy(_._1)
    val batches = all.grouped(math.max(1, all.length / 3)).toSeq
    var seen = Seq.empty[(Long, Seq[String])]
    for (b <- batches) {
      IncrementalDecontamination.processBatch(
        b.toSeq.toDF("doc_id", "w"), "doc_id", "w", bench, statePath, tau,
        containment)
      seen = seen ++ b
      val streaming = rowsOf(
        IncrementalDecontamination.flagged(spark, statePath).get)
      val batch = rowsOf(IncrementalDecontamination.flaggedBatch(
        seen.toDF("doc_id", "w"), "doc_id", "w", bench, tau, containment))
      assert(streaming == batch,
        s"flagged set diverged after ${seen.length} docs: " +
          s"${streaming.length} vs ${batch.length}")
      assert(streaming.nonEmpty, "vacuous: no contamination at this SF")
    }

    // replaying the last batch adds nothing (verdicts are pure)
    val before = IncrementalDecontamination.flagged(spark, statePath)
      .get.count()
    IncrementalDecontamination.processBatch(
      batches.last.toSeq.toDF("doc_id", "w"), "doc_id", "w",
      bench, statePath, tau, containment)
    val after = IncrementalDecontamination.flagged(spark, statePath)
      .get.count()
    assert(before == after, s"replay duplicated rows: $before -> $after")
    bench.unpersist()
  }

  test("incremental flagged set == one-shot d11 verdicts at every boundary; replay idempotent") {
    run(containment = false)
  }

  test("a doc delivered twice IN one batch does not double n_bench_matches") {
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        array_distinct(TextFunctions.tokens(col("text"))).as("w"))
    val isBench = col("source").isin("src0", "src1")
    val bench = docs.filter(isBench).select("doc_id", "w")
    val corpus = docs.filter(!isBench).select("doc_id", "w")
    val statePath = Files.createTempDirectory("graft-decon-dup").toString
    // in-batch duplicates are invisible to the cross-batch anti-join
    IncrementalDecontamination.processBatch(
      corpus.union(corpus), "doc_id", "w", bench, statePath, 0.9)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val streaming = rowsOf(
      IncrementalDecontamination.flagged(spark, statePath).get)
    val oneShot = rowsOf(IncrementalDecontamination.flaggedBatch(
      corpus, "doc_id", "w", bench, 0.9, containment = false))
    assert(streaming == oneShot, "duplicated batch rows inflated verdicts")
    assert(streaming.nonEmpty, "vacuous: no contamination at this SF")
  }

  test("CONTAINMENT metric: incremental flagged set == one-shot d16 verdicts at every boundary", Slow) {
    run(containment = true)
  }

  test("containment maintainer widens the jaccard one: asymmetric embeddings flagged") {
    // a long doc embedding a short benchmark item verbatim: jaccard
    // ~ size ratio (below any sane tau), containment = 1.0
    val bench = Seq((900L, (0 until 6).map(i => s"b$i"))).toDF("doc_id", "w")
    val corpus = Seq(
      (1L, (0 until 6).map(i => s"b$i") ++ (0 until 60).map(i => s"c$i")),
      (2L, (0 until 60).map(i => s"d$i"))).toDF("doc_id", "w")
    val jac = IncrementalDecontamination.flaggedBatch(
      corpus, "doc_id", "w", bench, 0.9)
    val cont = IncrementalDecontamination.flaggedBatch(
      corpus, "doc_id", "w", bench, 0.9, containment = true)
    assert(jac.count() == 0, "jaccard should not see the embedded item")
    assert(cont.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      Seq((1L, 1.0)))
  }
}
