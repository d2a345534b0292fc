package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TestData
import graft.streaming.IncrementalSample
import graft.text.{Mixture, TextFunctions}

/** The maintained weighted reservoir must equal the one-shot weighted
  * sample over everything seen, at EVERY batch boundary and under
  * replays — the min-k fold's idempotent/commutative algebra made
  * observable. */
class StreamingSampleSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("maintained reservoir == one-shot weighted sample at every boundary; replay absorbed") {
    val k = 5
    val docs = TestData.table(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("weight"))
    val statePath = Files.createTempDirectory("graft-reservoir").toString

    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .select("source", "doc_id", "weight", "priority", "sample_rank")
      .collect().map(_.toString).sorted.toSeq

    val all = docs.as[(String, Long, Long)].collect().sortBy(_._2)
    val batches = all.grouped(math.max(1, all.length / 4)).toSeq
    var seen = Seq.empty[(String, Long, Long)]
    for (b <- batches) {
      IncrementalSample.processBatch(
        b.toSeq.toDF("source", "doc_id", "weight"),
        "doc_id", "source", "weight", k, statePath)
      seen = seen ++ b
      val streaming = rowsOf(IncrementalSample.current(spark, statePath).get)
      val batch = rowsOf(Mixture.weightedSample(
        seen.toDF("source", "doc_id", "weight"),
        "doc_id", "source", "weight", k))
      assert(streaming == batch,
        s"reservoir diverged after ${seen.length} docs")
    }

    // replaying the last batch is absorbed exactly
    val before = rowsOf(IncrementalSample.current(spark, statePath).get)
    IncrementalSample.processBatch(
      batches.last.toSeq.toDF("source", "doc_id", "weight"),
      "doc_id", "source", "weight", k, statePath)
    assert(rowsOf(IncrementalSample.current(spark, statePath).get) == before)

    // ... and so is an out-of-order re-delivery of the FIRST batch
    IncrementalSample.processBatch(
      batches.head.toSeq.toDF("source", "doc_id", "weight"),
      "doc_id", "source", "weight", k, statePath)
    assert(rowsOf(IncrementalSample.current(spark, statePath).get) == before)
  }

  test("attach: the reservoir maintained from a real stream equals the batch sample") {
    val k = 3
    val docs = TestData.table(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("weight"))
      .as[(String, Long, Long)].collect().sortBy(_._2).toSeq
    val statePath = Files.createTempDirectory("graft-reservoir-s").toString

    implicit val sq = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long)]
    val q = IncrementalSample.attach(
      stream.toDS().toDF("source", "doc_id", "weight"),
      "doc_id", "source", "weight", k, statePath,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    docs.grouped(math.max(1, docs.length / 2)).foreach { b =>
      stream.addData(b.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    val streaming = IncrementalSample.current(spark, statePath).get
      .select("source", "doc_id", "weight", "priority", "sample_rank")
      .collect().map(_.toString).sorted.toSeq
    val batch = Mixture.weightedSample(
        docs.toDF("source", "doc_id", "weight"),
        "doc_id", "source", "weight", k)
      .select("source", "doc_id", "weight", "priority", "sample_rank")
      .collect().map(_.toString).sorted.toSeq
    assert(streaming == batch)
  }
}
