package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Similarity
import graft.sources.TestData
import graft.streaming.IncrementalIvfPqIndex

/** The frozen-artifacts contract of IVF-PQ maintenance: coarse
  * centroids AND PQ codebooks train once (first batch), later batches
  * assign/encode against them scan-locally, and the maintained index
  * probes identically to a one-shot build on the same frozen
  * artifacts. Retrain refreshes both deterministically. */
class StreamingIvfPqSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val P = IncrementalIvfPqIndex.Params(kLists = 16, m = 8, ksub = 16)

  private def corpusAndQuery() = {
    val emb = TestData.table(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    (emb.filter(col("vec_id") =!= 0).select("vec_id", "embedding"), q)
  }

  test("streaming batches probe identically to a one-shot build on frozen artifacts", Slow) {
    val (corpus, q) = corpusAndQuery()
    val statePath = Files.createTempDirectory("graft-incivfpq-s").toString

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val sqry = IncrementalIvfPqIndex.attach(
      stream.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
      statePath, P,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    val all = corpus.as[(Long, Seq[Float])].collect().sortBy(_._1)
    val batches = all.grouped(math.max(1, all.length / 4)).toSeq
    batches.foreach { b =>
      stream.addData(b.toIndexedSeq)
      sqry.processAllAvailable()
    }
    sqry.stop()

    // both sidecars hold the FIRST batch's deterministic training
    val first = batches.head.toSeq.toDF("vec_id", "embedding")
    val cents = IncrementalIvfPqIndex.centroids(spark, statePath).get
    assert(cents.toSeq == Similarity.ivfCentroids(
      first, "vec_id", "embedding", P.kLists, P.refineSteps).toSeq)
    val books = IncrementalIvfPqIndex.codebooks(spark, statePath).get
    assert(books.map(_.toSeq).toSeq == Similarity.pqCodebooks(
      first, "vec_id", "embedding", P.m, P.ksub,
      P.refineSteps).map(_.toSeq).toSeq)

    // maintained probe == one-shot assignment of the full corpus
    // against those same frozen artifacts
    val oneShot = Similarity.withIvfLists(
      Similarity.withPqCodes(corpus, "embedding", books), "embedding", cents)
    val ref = Similarity.ivfPqTopK(oneShot, "vec_id", "embedding", q, 10,
        cents, books, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = IncrementalIvfPqIndex.ivfPqTopK(spark, statePath,
        "vec_id", "embedding", q, 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == ref)
    assert(IncrementalIvfPqIndex.index(spark, statePath).get.count()
      == all.length.toLong)
  }

  test("replay idempotent; probe prunes lists and skips vector bytes; retrain deterministic", Slow) {
    val (corpus, q) = corpusAndQuery()
    val statePath = Files.createTempDirectory("graft-incivfpq-b").toString
    val parts = corpus.as[(Long, Seq[Float])].collect().sortBy(_._1)
      .grouped(200).map(_.toSeq.toDF("vec_id", "embedding")).toSeq
    IncrementalIvfPqIndex.processBatch(parts(0), "vec_id", "embedding",
      statePath, P)
    // foreachBatch retry: full replay of the same batch
    IncrementalIvfPqIndex.processBatch(parts(0), "vec_id", "embedding",
      statePath, P)
    parts.drop(1).foreach(b =>
      IncrementalIvfPqIndex.processBatch(b, "vec_id", "embedding",
        statePath, P))
    val n = corpus.count()
    assert(IncrementalIvfPqIndex.index(spark, statePath).get.count() == n,
      "replay duplicated index rows")

    // candidate-scan plan over the maintained layout: partition-pruned
    // on ivf_list AND no vector column in ReadSchema
    val cents = IncrementalIvfPqIndex.centroids(spark, statePath).get
    val books = IncrementalIvfPqIndex.codebooks(spark, statePath).get
    val idx = IncrementalIvfPqIndex.index(spark, statePath).get
    val probes = Similarity.ivfProbes(q, cents, 4)
    val cand = Similarity.pqCandidates(
      idx.filter(col("ivf_list").isin(probes: _*)), "vec_id", q, books, 80)
    val plan = cand.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = plan.collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.metadata("PartitionFilters").contains("ivf_list"),
      s"probe not partition-pruned: ${scan.metadata("PartitionFilters")}")
    assert(!scan.metadata("ReadSchema").contains("embedding"),
      s"ADC scan reads vectors: ${scan.metadata("ReadSchema")}")

    // snapshot isolation across the retrain swap: a reader that
    // resolved the index BEFORE the rewrite still completes on its
    // version (retire keeps the previous generation's files on disk),
    // even though new readers resolve the new version
    val heldSnapshot = IncrementalIvfPqIndex.index(spark, statePath).get
    val heldIds = heldSnapshot.select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val heldDir = new java.io.File(graft.streaming.IndexDirs
      .currentDir(spark, s"$statePath/index",
        Seq("_centroids/_SUCCESS", "_codebooks/_SUCCESS")).get)

    // retrain: both artifacts refresh deterministically, swapped whole
    IncrementalIvfPqIndex.retrain(spark, statePath, "vec_id", "embedding", P)
    val newDir = new java.io.File(graft.streaming.IndexDirs
      .currentDir(spark, s"$statePath/index",
        Seq("_centroids/_SUCCESS", "_codebooks/_SUCCESS")).get)
    assert(newDir != heldDir, "retrain did not land a new version")
    assert(heldDir.exists, "previous version not retained for readers")
    assert(heldSnapshot.select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq == heldIds,
      "reader holding the pre-retrain snapshot did not complete on it")
    // a SECOND rewrite retires the held generation (one-deep retention)
    IncrementalIvfPqIndex.retrain(spark, statePath, "vec_id", "embedding", P)
    assert(!heldDir.exists,
      "two-generations-old version should be out of retention")
    assert(IncrementalIvfPqIndex.centroids(spark, statePath).get.toSeq ==
      Similarity.ivfCentroids(corpus, "vec_id", "embedding",
        P.kLists, P.refineSteps).toSeq)
    assert(IncrementalIvfPqIndex.codebooks(spark, statePath).get
      .map(_.toSeq).toSeq ==
      Similarity.pqCodebooks(corpus, "vec_id", "embedding", P.m, P.ksub,
        P.refineSteps).map(_.toSeq).toSeq)
    assert(IncrementalIvfPqIndex.index(spark, statePath).get.count() == n)
  }
}
