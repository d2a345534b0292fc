package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TestData
import graft.streaming.IncrementalDsir
import graft.text.Mixture

/** DSIR importance scoring as maintained state — the frozen-model +
  * retrain contract: between retrains new arrivals score under the
  * frozen model and old scores never move; after a retrain the
  * maintained scores equal the one-shot c10 operator over every doc
  * ingested, exactly. */
class StreamingDsirSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val isTgt = col("source") === Mixture.DsirTargetSource

  private def rowsOf(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select("doc_id", "n_tokens", "logratio").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  test("retrain == one-shot c10 at every batch boundary; replay idempotent") {
    val docs = TestData.table(spark, sf, "documents")
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().sortBy(_._1)
    val statePath = Files.createTempDirectory("graft-dsir").toString
    val batches = docs.grouped(math.max(1, docs.length / 3)).toSeq
    var seen = Seq.empty[(Long, String, String)]
    for (b <- batches) {
      IncrementalDsir.processBatch(
        b.toSeq.toDF("doc_id", "text", "source"),
        "doc_id", "text", isTgt, statePath)
      seen = seen ++ b
      IncrementalDsir.retrain(spark, statePath, "doc_id")
      val streaming = rowsOf(IncrementalDsir.scores(spark, statePath).get)
      val oneShot = rowsOf(Mixture.importanceWeights(
        seen.toDF("doc_id", "text", "source"), "doc_id", "text", isTgt))
      assert(streaming == oneShot, s"diverged after ${seen.length} docs")
    }
    // replaying the last batch changes nothing (docs or scores)
    val before = rowsOf(IncrementalDsir.scores(spark, statePath).get)
    val storeBefore = IncrementalDsir.docsStore(spark, statePath).get.count()
    IncrementalDsir.processBatch(
      batches.last.toSeq.toDF("doc_id", "text", "source"),
      "doc_id", "text", isTgt, statePath)
    assert(rowsOf(IncrementalDsir.scores(spark, statePath).get) == before)
    assert(IncrementalDsir.docsStore(spark, statePath).get.count()
      == storeBefore)
  }

  test("frozen model between retrains: old scores fixed, arrivals scored " +
      "under it (OOV included), retrain reconciles") {
    val statePath = Files.createTempDirectory("graft-dsir2").toString
    def df(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "source")
    // batch 1 trains: target speaks {alpha..gamma}, raw {kappa..mu}
    val b1 = Seq(
      (1L, "alpha beta gamma alpha beta", "src0"),
      (2L, "kappa lambda mu kappa lambda", "srcX"),
      (3L, "alpha kappa beta lambda mu", "srcX"))
    IncrementalDsir.processBatch(df(b1), "doc_id", "text", isTgt, statePath)
    val s1 = rowsOf(IncrementalDsir.scores(spark, statePath).get)
    assert(s1.map(_._1) == Seq(2L, 3L), "raw docs of batch 1 scored")
    assert(s1 == rowsOf(Mixture.importanceWeights(df(b1),
      "doc_id", "text", isTgt)), "initial train == one-shot")

    // batch 2: one target-vocab doc, one with an OOV token ("zeta")
    val b2 = Seq(
      (10L, "alpha beta gamma beta", "srcX"),
      (11L, "kappa zeta zeta mu", "srcX"))
    IncrementalDsir.processBatch(df(b2), "doc_id", "text", isTgt, statePath)
    val s2 = rowsOf(IncrementalDsir.scores(spark, statePath).get)
    // old rows byte-identical — the model is frozen
    assert(s2.filter(r => Set(2L, 3L)(r._1)) == s1)
    // new rows carry frozen-model scores: the factored scorer over the
    // batch-1-trained model is the ground truth (OOV weight exercised
    // by doc 11's "zeta")
    val m1 = Mixture.dsirModel(df(b1), "text", isTgt)
    val expected = rowsOf(Mixture.scoreUnderModel(
      df(b2), "doc_id", "text", m1))
    assert(s2.filter(r => Set(10L, 11L)(r._1)) == expected)
    // target-vocab arrival outranks the OOV/raw-vocab one
    val byId = s2.map(r => r._1 -> r._3).toMap
    assert(byId(10L) > byId(11L))

    // retrain folds the arrivals into the model: exact c10 over all
    IncrementalDsir.retrain(spark, statePath, "doc_id")
    assert(rowsOf(IncrementalDsir.scores(spark, statePath).get)
      == rowsOf(Mixture.importanceWeights(df(b1 ++ b2),
        "doc_id", "text", isTgt)))
  }

  test("no model until both sides seen; single-sided retrain is a no-op") {
    val statePath = Files.createTempDirectory("graft-dsir3").toString
    val rawOnly = Seq((1L, "kappa lambda", "srcX"), (2L, "mu nu", "srcX"))
    IncrementalDsir.processBatch(rawOnly.toDF("doc_id", "text", "source"),
      "doc_id", "text", isTgt, statePath)
    assert(IncrementalDsir.scores(spark, statePath).isEmpty)
    IncrementalDsir.retrain(spark, statePath, "doc_id")
    assert(IncrementalDsir.scores(spark, statePath).isEmpty)
    // the target's arrival trains on everything accumulated
    IncrementalDsir.processBatch(
      Seq((3L, "alpha beta alpha", "src0")).toDF("doc_id", "text", "source"),
      "doc_id", "text", isTgt, statePath)
    val all = rawOnly :+ (3L, "alpha beta alpha", "src0")
    assert(rowsOf(IncrementalDsir.scores(spark, statePath).get)
      == rowsOf(Mixture.importanceWeights(
        all.toDF("doc_id", "text", "source"), "doc_id", "text", isTgt)))
  }

  test("attach: scores maintained from a real stream + retrain == one-shot") {
    val docs = TestData.table(spark, sf, "documents")
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val statePath = Files.createTempDirectory("graft-dsir-s").toString

    implicit val sq = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = IncrementalDsir.attach(
      stream.toDS().toDF("doc_id", "text", "source"),
      "doc_id", "text", isTgt, statePath,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    docs.grouped(math.max(1, docs.length / 2)).foreach { b =>
      stream.addData(b.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    IncrementalDsir.retrain(spark, statePath, "doc_id")
    val streaming = rowsOf(IncrementalDsir.scores(spark, statePath).get)
    val oneShot = rowsOf(Mixture.importanceWeights(
      docs.toDF("doc_id", "text", "source"), "doc_id", "text", isTgt))
    assert(streaming == oneShot)
  }

  test("params are frozen per state dir — processBatch, retrain, model") {
    val statePath = Files.createTempDirectory("graft-dsir4").toString
    val b = Seq((1L, "alpha", "src0"), (2L, "kappa", "srcX"))
      .toDF("doc_id", "text", "source")
    IncrementalDsir.processBatch(b, "doc_id", "text", isTgt, statePath)
    val drifted = IncrementalDsir.Params(hashBuckets = 1 << 16)
    for (call <- Seq[() => Any](
        () => IncrementalDsir.processBatch(b, "doc_id", "text", isTgt,
          statePath, drifted),
        // a drifted retrain would rewrite the weights under a different
        // fb layout; a drifted model() would featurize raw strings
        // against hashed keys — both must fail fast, not corrupt
        () => IncrementalDsir.retrain(spark, statePath, "doc_id", drifted),
        () => IncrementalDsir.model(spark, statePath, drifted))) {
      val e = intercept[IllegalArgumentException](call())
      assert(e.getMessage.contains("frozen"))
    }
  }

  test("frozen-model scoring follows the CLAIMED rows, not the batch's") {
    val statePath = Files.createTempDirectory("graft-dsir5").toString
    def df(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "text", "source")
    IncrementalDsir.processBatch(
      df(Seq((1L, "alpha beta", "src0"), (2L, "kappa mu", "srcX"))),
      "doc_id", "text", isTgt, statePath)
    assert(rowsOf(IncrementalDsir.scores(spark, statePath).get)
      .map(_._1) == Seq(2L))
    // doc 1 re-arrives claiming to be RAW with new text, doc 3 is new:
    // the store's claimed rows say 1 is target — it must NOT be scored
    // from the replayed batch's contradicting flag/text
    IncrementalDsir.processBatch(
      df(Seq((1L, "kappa kappa", "srcX"), (3L, "mu mu", "srcX"))),
      "doc_id", "text", isTgt, statePath)
    val ids = rowsOf(IncrementalDsir.scores(spark, statePath).get).map(_._1)
    assert(ids == Seq(2L, 3L), s"claimed-target doc leaked a score: $ids")
    // and doc 3's replay with amended text revises nothing
    val before = rowsOf(IncrementalDsir.scores(spark, statePath).get)
    IncrementalDsir.processBatch(
      df(Seq((3L, "totally different", "srcX"))),
      "doc_id", "text", isTgt, statePath)
    assert(rowsOf(IncrementalDsir.scores(spark, statePath).get) == before)
  }
}
