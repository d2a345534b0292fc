package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TestData
import graft.streaming.{IncrementalCuration, IncrementalEmbeddingDedup, IncrementalNearDup}

/** Streaming ≡ batch for the WHOLE curation pipeline: documents
  * arriving in micro-batches fold into the incremental near-dup state,
  * and the curated view (scoring + cluster-representative keep-set +
  * admission filters) over the docs seen so far must equal the
  * one-shot batch pipeline at EVERY prefix — not just after the last
  * batch. That is the dynamic-table contract applied to curation. */
class StreamingCurationSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val P = IncrementalNearDup.Params(shingleLen = 1, numHashes = 32,
    numBands = 4, threshold = 0.7, maxBucket = 10000)

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSeq

  test("streaming curated view == batch curation at every batch boundary", Slow) {
    val docs = TestData.table(spark, sf, "documents").select("doc_id", "text")
    val statePath = Files.createTempDirectory("graft-curation-s").toString
    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val batches = all.grouped(math.max(1, all.length / 3)).toSeq

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = IncrementalNearDup.attach(
      stream.toDS().toDF("doc_id", "text"), "doc_id", "text", statePath, P,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))

    var seen = Seq.empty[(Long, String)]
    for (b <- batches) {
      stream.addData(b.toIndexedSeq)
      q.processAllAvailable()
      seen = seen ++ b
      val seenDf = seen.toDF("doc_id", "text")
      val streaming = rowsOf(IncrementalCuration.curated(
        seenDf, "doc_id", "text", statePath))
      val batch = rowsOf(IncrementalCuration.curatedBatch(
        seenDf, "doc_id", "text", P))
      assert(streaming == batch,
        s"curated view diverged after ${seen.length} docs: " +
          s"streaming ${streaming.length} rows, batch ${batch.length} rows")
      assert(streaming.nonEmpty, "degenerate check: empty curated view")
    }
    q.stop()

    // the final curated view keeps exactly one representative per
    // surviving cluster and only admitted docs
    val finalView = IncrementalCuration.curated(
      seen.toDF("doc_id", "text"), "doc_id", "text", statePath)
    assert(finalView.filter(col("quality_score") < 0.72).count() == 0)
    assert(finalView.select("doc_id").distinct().count() == finalView.count())
  }

  test("streaming SEMANTIC curation (both dedup axes) == batch c03 composition at every boundary", Slow) {
    val docs = TestData.table(spark, sf, "documents").select("doc_id", "text")
    val emb = TestData.table(spark, sf, "embeddings")
      .select("vec_id", "embedding")
      .withColumnRenamed("vec_id", "doc_id")
    val statePath = Files.createTempDirectory("graft-curation-sl").toString
    val semStatePath = Files.createTempDirectory("graft-curation-se").toString
    val SemP = IncrementalEmbeddingDedup.Params()

    val allDocs = docs.as[(Long, String)].collect().sortBy(_._1)
    val embById = emb.as[(Long, Seq[Float])].collect().toMap
    val batches = allDocs.grouped(math.max(1, allDocs.length / 3)).toSeq

    var seen = Seq.empty[(Long, String)]
    for (b <- batches) {
      // both maintainers fold the same arrival slice (docs + their
      // embeddings — the two axes of one corpus)
      IncrementalNearDup.processBatch(
        b.toSeq.toDF("doc_id", "text"), "doc_id", "text", statePath, P)
      IncrementalEmbeddingDedup.processBatch(
        b.map { case (id, _) => (id, embById(id)) }.toSeq
          .toDF("doc_id", "embedding"),
        "doc_id", "embedding", semStatePath, SemP)
      seen = seen ++ b
      val seenDocs = seen.toDF("doc_id", "text")
      val seenVecs = seen.map { case (id, _) => (id, embById(id)) }
        .toDF("doc_id", "embedding")
      val streaming = rowsOf(IncrementalCuration.curatedSemantic(
        seenDocs, "doc_id", "text", statePath, semStatePath))
      val batch = rowsOf(IncrementalCuration.curatedSemanticBatch(
        seenDocs, "doc_id", "text", seenVecs, "embedding", P, SemP))
      assert(streaming == batch,
        s"semantic curated view diverged after ${seen.length} docs: " +
          s"streaming ${streaming.length} rows, batch ${batch.length} rows")
    }
    // the semantic axis must actually bite: strictly fewer survivors
    // than the lexical-only view (the shipped embeddings carry dups)
    val lexOnly = IncrementalCuration.curated(
      seen.toDF("doc_id", "text"), "doc_id", "text", statePath).count()
    val both = IncrementalCuration.curatedSemantic(
      seen.toDF("doc_id", "text"), "doc_id", "text",
      statePath, semStatePath).count()
    assert(both < lexOnly, s"semantic stage filtered nothing: $both vs $lexOnly")
  }

  test("streaming DECONTAMINATED curation == batch c02-shape at every boundary", Slow) {
    import graft.dedup.Dedup
    val docs = TestData.table(spark, sf, "documents")
      .select("doc_id", "source", "text")
    val isBench = col("source").isin("src0", "src1")
    val benchDf = docs.filter(isBench).select("doc_id", "text").cache()
    val corpus = docs.filter(!isBench).select("doc_id", "text")
    val statePath = Files.createTempDirectory("graft-curation-dc").toString
    val gramLen = 5

    // the benchmark is static reference state: gram set + bloom built once
    val benchIdx = Dedup.benchmarkIndex(benchDf, "text", gramLen)

    val all = corpus.as[(Long, String)].collect().sortBy(_._1)
    val batches = all.grouped(math.max(1, all.length / 3)).toSeq
    var seen = Seq.empty[(Long, String)]
    for (b <- batches) {
      IncrementalNearDup.processBatch(
        b.toSeq.toDF("doc_id", "text"), "doc_id", "text", statePath, P)
      seen = seen ++ b
      val seenDf = seen.toDF("doc_id", "text")
      val streaming = rowsOf(IncrementalCuration.curatedClean(
        seenDf, "doc_id", "text", statePath, benchIdx, gramLen))
      val batch = rowsOf(IncrementalCuration.curatedCleanBatch(
        seenDf, "doc_id", "text", benchDf, gramLen, 0, P))
      assert(streaming == batch,
        s"decontaminated view diverged after ${seen.length} docs: " +
          s"streaming ${streaming.length} rows, batch ${batch.length} rows")
      // clean ⊆ curated, and the dropped set is exactly the
      // contaminated survivors (per-doc property, no hidden state)
      val curatedIds = IncrementalCuration.curated(
        seenDf, "doc_id", "text", statePath)
        .select("doc_id").as[Long].collect().toSet
      val cleanIds = streaming.map(_._1).toSet
      assert(cleanIds.subsetOf(curatedIds))
      val contaminated = Dedup.contaminationCountsWith(
        seenDf, benchIdx, "doc_id", "text", gramLen)
        .select("doc_id").as[Long].collect().toSet
      assert(curatedIds -- cleanIds == curatedIds.intersect(contaminated))
    }
    // the filter must actually bite on the shipped corpus (src0/src1
    // grams leak into other sources at this SF — d04's premise)
    val contamTotal = Dedup.contaminationCountsWith(
      seen.toDF("doc_id", "text"), benchIdx, "doc_id", "text", gramLen).count()
    assert(contamTotal > 0, "no contamination in corpus — test is vacuous")
    benchIdx.grams.unpersist()
    benchDf.unpersist()
  }

  test("streaming EXPORT view (curate -> mix -> pack) == batch composition at every boundary", Slow) {
    import graft.text.Mixture
    val docs = TestData.table(spark, sf, "documents")
      .select("doc_id", "source", "text")
    val emb = TestData.table(spark, sf, "embeddings")
      .select("vec_id", "embedding").withColumnRenamed("vec_id", "doc_id")
    val statePath = Files.createTempDirectory("graft-export-sl").toString
    val semStatePath = Files.createTempDirectory("graft-export-se").toString
    val SemP = IncrementalEmbeddingDedup.Params()
    val budgets = Mixture.ExportBudgets.toDF("source", "token_budget")
    val seqTokens = Mixture.ExportSeqTokens

    val allDocs = docs.as[(Long, String, String)].collect().sortBy(_._1)
    val embById = emb.as[(Long, Seq[Float])].collect().toMap
    val batches = allDocs.grouped(math.max(1, allDocs.length / 3)).toSeq

    def rowsOf6(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

    var seen = Seq.empty[(Long, String, String)]
    for (b <- batches) {
      IncrementalNearDup.processBatch(
        b.toSeq.toDF("doc_id", "source", "text"), "doc_id", "text",
        statePath, P)
      IncrementalEmbeddingDedup.processBatch(
        b.map { case (id, _, _) => (id, embById(id)) }.toSeq
          .toDF("doc_id", "embedding"),
        "doc_id", "embedding", semStatePath, SemP)
      seen = seen ++ b
      val seenDocs = seen.toDF("doc_id", "source", "text")
      val seenVecs = seen.map { case (id, _, _) => (id, embById(id)) }
        .toDF("doc_id", "embedding")
      val streaming = rowsOf6(IncrementalCuration.exportPacked(
        seenDocs, "doc_id", "source", "text", statePath, semStatePath,
        budgets, seqTokens))
      val batch = rowsOf6(IncrementalCuration.exportPackedBatch(
        seenDocs, "doc_id", "source", "text", seenVecs, "embedding",
        budgets, seqTokens, P, SemP))
      assert(streaming == batch,
        s"export view diverged after ${seen.length} docs: " +
          s"streaming ${streaming.length} seqs, batch ${batch.length} seqs")
    }
    val finalView = IncrementalCuration.exportPacked(
      seen.toDF("doc_id", "source", "text"), "doc_id", "source", "text",
      statePath, semStatePath, budgets, seqTokens).cache()
    assert(finalView.count() > 0, "degenerate check: empty export")

    // the shard-manifest tail (c08's shape) over the MAINTAINED export
    // conserves sequences/docs/tokens and is a pure key function
    val manifest = IncrementalCuration.exportManifest(finalView, "source")
      .cache()
    assert(manifest.agg(sum("n_seqs")).head().getLong(0)
      == finalView.count())
    assert(manifest.agg(sum("shard_tokens")).head().getLong(0)
      == finalView.agg(sum("seq_tokens")).head().getLong(0))
    val again = IncrementalCuration.exportManifest(finalView, "source")
      .collect().map(_.toString).toSeq
    assert(again == manifest.collect().map(_.toString).toSeq)
    manifest.unpersist(); finalView.unpersist()
  }
}
