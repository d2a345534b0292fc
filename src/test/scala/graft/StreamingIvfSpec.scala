package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Similarity
import graft.sources.TestData
import graft.streaming.IncrementalIvfIndex

/** The frozen-quantizer contract of IVF maintenance: centroids train
  * once (first batch), every later batch assigns against them
  * scan-locally, and the maintained index probes identically to a
  * one-shot build over the same corpus with the same centroids.
  * Retrain is the explicit drift response — deterministic, so it
  * equals a fresh build on the accumulated corpus. */
class StreamingIvfSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val P = IncrementalIvfIndex.Params(k = 16)

  private def corpusAndQuery() = {
    val emb = TestData.table(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    (emb.filter(col("vec_id") =!= 0).select("vec_id", "embedding"), q)
  }

  test("streaming batches probe identically to a one-shot build on the frozen quantizer") {
    val (corpus, q) = corpusAndQuery()
    val statePath = Files.createTempDirectory("graft-incivf-s").toString

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val sqry = IncrementalIvfIndex.attach(
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

    // the sidecar holds the FIRST batch's deterministic training
    val cents = IncrementalIvfIndex.centroids(spark, statePath).get
    val expectCents = Similarity.ivfCentroids(
      batches.head.toSeq.toDF("vec_id", "embedding"),
      "vec_id", "embedding", P.k, P.refineSteps)
    assert(cents.toSeq == expectCents.toSeq,
      "quantizer must be the first batch's training, frozen")

    // maintained probe == one-shot assignment of the full corpus
    // against those same centroids
    val ref = Similarity.ivfTopK(
        Similarity.withIvfLists(corpus, "embedding", cents),
        "vec_id", "embedding", q, 10, cents, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = IncrementalIvfIndex.ivfTopK(spark, statePath,
        "vec_id", "embedding", q, 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == ref)
    assert(IncrementalIvfIndex.index(spark, statePath).get.count()
      == all.length.toLong)
  }

  test("replay is idempotent; retrain equals a fresh deterministic build; probe prunes") {
    val (corpus, q) = corpusAndQuery()
    val statePath = Files.createTempDirectory("graft-incivf-b").toString
    val parts = corpus.as[(Long, Seq[Float])].collect().sortBy(_._1)
      .grouped(200).map(_.toSeq.toDF("vec_id", "embedding")).toSeq
    IncrementalIvfIndex.processBatch(parts(0), "vec_id", "embedding",
      statePath, P)
    // foreachBatch retry: full replay of the same batch
    IncrementalIvfIndex.processBatch(parts(0), "vec_id", "embedding",
      statePath, P)
    parts.drop(1).foreach(b =>
      IncrementalIvfIndex.processBatch(b, "vec_id", "embedding", statePath, P))
    val n = corpus.count()
    assert(IncrementalIvfIndex.index(spark, statePath).get.count() == n,
      "replay duplicated index rows")

    // probe plan: partition-pruned read of the probed lists
    val probe = IncrementalIvfIndex.ivfTopK(spark, statePath,
      "vec_id", "embedding", q, 10, nProbe = 4)
    val plan = probe.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val pf = plan.collectFirst { case f: FileSourceScanExec => f }
      .get.metadata("PartitionFilters")
    assert(pf.contains("ivf_list"), s"IVF probe not partition-pruned: $pf")

    // retrain: new quantizer over the accumulated corpus, atomically
    // swapped; deterministic, so it equals a fresh one-shot build
    IncrementalIvfIndex.retrain(spark, statePath, "vec_id", "embedding", P)
    val cents = IncrementalIvfIndex.centroids(spark, statePath).get
    val expect = Similarity.ivfCentroids(corpus, "vec_id", "embedding",
      P.k, P.refineSteps)
    assert(cents.toSeq == expect.toSeq,
      "retrained quantizer must match training on the accumulated corpus")
    assert(IncrementalIvfIndex.index(spark, statePath).get.count() == n)
    val got = IncrementalIvfIndex.ivfTopK(spark, statePath,
        "vec_id", "embedding", q, 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ref = Similarity.ivfTopK(
        Similarity.withIvfLists(corpus, "embedding", expect),
        "vec_id", "embedding", q, 10, expect, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == ref)
  }
}
