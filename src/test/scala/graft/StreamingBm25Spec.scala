package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TestData
import graft.streaming.IncrementalBm25
import graft.streaming.IncrementalBm25.Params
import graft.text.Retrieval

/** Search-index maintenance: the persisted postings/doclen/scalar
  * stores must serve BM25 scores IDENTICAL (4 dp) to the one-shot
  * operator over every doc ingested so far, at every batch boundary,
  * with query-time reads pruned to the query terms' buckets. */
class StreamingBm25Spec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val terms = Seq("hash", "join", "sort", "merge")

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "bm25", "n_matched_terms")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq

  test("maintained index == one-shot bm25TopK at every boundary; replay idempotent") {
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val statePath = Files.createTempDirectory("graft-bm25").toString

    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val batches = all.grouped(math.max(1, all.length / 3)).toSeq
    var seen = Seq.empty[(Long, String)]
    for (b <- batches) {
      IncrementalBm25.processBatch(
        b.toSeq.toDF("doc_id", "text"), "doc_id", "text", statePath)
      seen = seen ++ b
      val streaming = rowsOf(
        IncrementalBm25.bm25TopK(spark, statePath, terms, 20).get)
      val oneShot = rowsOf(Retrieval.bm25TopK(
        seen.toDF("doc_id", "text"), "doc_id", "text", terms, 20))
      assert(streaming == oneShot,
        s"scores diverged after ${seen.length} docs")
    }
    assert(rowsOf(IncrementalBm25.bm25TopK(spark, statePath, terms, 20).get)
      .exists(_._2 > 0), "vacuous: no scoring docs")

    // replaying the last batch changes nothing — scores, postings
    // volume, and the scalar rows all converge
    val before = rowsOf(
      IncrementalBm25.bm25TopK(spark, statePath, terms, 20).get)
    val postRows = IncrementalBm25.postings(spark, statePath).get.count()
    IncrementalBm25.processBatch(
      batches.last.toSeq.toDF("doc_id", "text"), "doc_id", "text", statePath)
    assert(rowsOf(IncrementalBm25.bm25TopK(spark, statePath, terms, 20).get)
      == before)
    assert(IncrementalBm25.postings(spark, statePath).get.count() == postRows,
      "replay appended duplicate postings")
  }

  test("a doc delivered twice IN one batch does not inflate N/avgdl/df") {
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(40)
    val statePath = Files.createTempDirectory("graft-bm25-dup").toString
    // batch = docs ∪ docs: the anti-join replay guards can't see this —
    // only the entry dropDuplicates can
    IncrementalBm25.processBatch(
      docs.union(docs), "doc_id", "text", statePath)
    val streaming = rowsOf(
      IncrementalBm25.bm25TopK(spark, statePath, terms, 20).get)
    val oneShot = rowsOf(
      Retrieval.bm25TopK(docs, "doc_id", "text", terms, 20))
    assert(streaming == oneShot, "duplicated batch rows leaked into state")
    assert(IncrementalBm25.docLengths(spark, statePath).get.count()
      == docs.count(), "doclen store holds duplicate rows")
  }

  test("crash window (postings landed, doclen+scalars did not): replay converges") {
    val statePath = Files.createTempDirectory("graft-bm25c").toString
    val b1 = Seq((1L, "hash join hash sort extra words here"),
      (2L, "merge sort merge merge and more text"))
    def run(b: Seq[(Long, String)]): Unit =
      IncrementalBm25.processBatch(
        b.toDF("doc_id", "text"), "doc_id", "text", statePath)
    run(b1)
    val afterB1 = rowsOf(
      IncrementalBm25.bm25TopK(spark, statePath, terms, 10).get)
    val postRows = IncrementalBm25.postings(spark, statePath).get.count()

    // simulate the crash: postings survived, doclen + scalars vanished
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$statePath/doclen"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$statePath/scalars"))
    run(b1)
    assert(rowsOf(IncrementalBm25.bm25TopK(spark, statePath, terms, 10).get)
      == afterB1, "replay after crash window diverged")
    assert(IncrementalBm25.postings(spark, statePath).get.count() == postRows,
      "replay must not duplicate postings rows")

    // the stream continues, new docs shift df and the scores follow
    run(Seq((3L, "join join join short doc")))
    val oneShot = rowsOf(Retrieval.bm25TopK(
      (b1 :+ (3L, "join join join short doc")).toDF("doc_id", "text"),
      "doc_id", "text", terms, 10))
    assert(rowsOf(IncrementalBm25.bm25TopK(spark, statePath, terms, 10).get)
      == oneShot)
  }

  test("query probe prunes to the terms' tb buckets; compact+vacuum keep scores") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val statePath = Files.createTempDirectory("graft-bm25p").toString
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    IncrementalBm25.processBatch(docs, "doc_id", "text", statePath)
    // drain L0 into the bucketed layout: partition-pruning is the
    // POST-sweep steady state (pre-sweep probes read the bounded L0)
    IncrementalBm25.compact(spark, statePath)

    val pruned = IncrementalBm25.postings(spark, statePath).get
      .filter(col("tb").isin(0, 1))
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.metadata("PartitionFilters").contains("tb"),
      s"postings probe not partition-pruned")
    pruned.collect()
    assert(scan.metrics("numFiles").value <
      IncrementalBm25.postings(spark, statePath).get.inputFiles.length)

    val before = rowsOf(
      IncrementalBm25.bm25TopK(spark, statePath, terms, 20).get)
    IncrementalBm25.compact(spark, statePath)
    assert(rowsOf(IncrementalBm25.bm25TopK(spark, statePath, terms, 20).get)
      == before, "compaction changed scores")
    IncrementalBm25.vacuum(spark, statePath, keep = 1)
    assert(rowsOf(IncrementalBm25.bm25TopK(spark, statePath, terms, 20).get)
      == before, "vacuum changed scores")

    val e = intercept[IllegalArgumentException] {
      IncrementalBm25.processBatch(
        Seq((888888L, "hash join")).toDF("doc_id", "text"),
        "doc_id", "text", statePath, Params(termBuckets = 128))
    }
    assert(e.getMessage.contains("frozen"))
  }

  test("query on an empty state dir is read-only: no sidecar poisoning") {
    val statePath = Files.createTempDirectory("graft-bm25e").toString
    // a probing query with NON-default params must not freeze them
    assert(IncrementalBm25.bm25TopK(spark, statePath, terms, 5,
      params = Params(termBuckets = 128)).isEmpty)
    // the eventual writer's defaults still win
    IncrementalBm25.processBatch(
      Seq((1L, "hash join sort")).toDF("doc_id", "text"),
      "doc_id", "text", statePath)
    assert(IncrementalBm25.bm25TopK(spark, statePath, terms, 5)
      .get.count() == 1)
  }

  test("fresh docs into an orphaned pre-scalar state fail loudly") {
    val statePath = Files.createTempDirectory("graft-bm25o").toString
    IncrementalBm25.processBatch(
      Seq((1L, "hash join sort")).toDF("doc_id", "text"),
      "doc_id", "text", statePath)
    // simulate the crash: postings/doclen landed, scalars never did
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$statePath/scalars"))
    val e = intercept[IllegalArgumentException] {
      IncrementalBm25.processBatch(
        Seq((2L, "merge only fresh doc")).toDF("doc_id", "text"),
        "doc_id", "text", statePath)
    }
    assert(e.getMessage.contains("replay the interrupted batch"))
    // the replay itself is accepted and converges
    IncrementalBm25.processBatch(
      Seq((1L, "hash join sort")).toDF("doc_id", "text"),
      "doc_id", "text", statePath)
    assert(IncrementalBm25.bm25TopK(spark, statePath, terms, 5)
      .get.count() == 1)
  }

  test("attach() drives a real stream to one-shot equality") {
    val docs = TestData.table(spark, sf, "documents")
      .select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).take(300).toSeq
    val statePath = Files.createTempDirectory("graft-bm25s").toString

    implicit val sq = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = IncrementalBm25.attach(
      stream.toDS().toDF("doc_id", "text"), "doc_id", "text", statePath,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    docs.grouped(math.max(1, docs.length / 2)).foreach { b =>
      stream.addData(b.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    assert(rowsOf(IncrementalBm25.bm25TopK(spark, statePath, terms, 20).get)
      == rowsOf(Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
        "doc_id", "text", terms, 20)))
  }
}
