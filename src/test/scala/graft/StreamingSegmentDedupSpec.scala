package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sources.TestData
import graft.streaming.IncrementalSegmentDedup

/** Passage dedup as maintained state: the claimed-segment relation is
  * append-only under id-ordered arrivals, so the accumulated per-doc
  * results must equal the one-shot d14 operator over the docs seen so
  * far at EVERY batch boundary — exactly, including the reassembled
  * text hashes. */
class StreamingSegmentDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("incremental results == one-shot segmentDedup at every boundary; replay idempotent") {
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val statePath = Files.createTempDirectory("graft-segdedup").toString

    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_segs", "n_dropped", "text_hash")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1).toSeq

    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val batches = all.grouped(math.max(1, all.length / 3)).toSeq
    var seen = Seq.empty[(Long, String)]
    for (b <- batches) {
      IncrementalSegmentDedup.processBatch(
        b.toSeq.toDF("doc_id", "text"), "doc_id", "text", statePath, 10)
      seen = seen ++ b
      val streaming = rowsOf(
        IncrementalSegmentDedup.results(spark, statePath).get)
      val oneShot = rowsOf(Dedup.segmentDedup(
        seen.toDF("doc_id", "text"), "doc_id", "text", 10))
      assert(streaming == oneShot,
        s"results diverged after ${seen.length} docs")
    }
    // the corpus actually contains cross-doc duplicate segments
    val dropped = IncrementalSegmentDedup.results(spark, statePath).get
      .agg(sum("n_dropped")).collect()(0).getLong(0)
    assert(dropped > 0, "vacuous: no duplicated segments at this SF")

    // replaying the last batch changes nothing (results are keyed and
    // claims are anti-joined)
    val before = rowsOf(IncrementalSegmentDedup.results(spark, statePath).get)
    IncrementalSegmentDedup.processBatch(
      batches.last.toSeq.toDF("doc_id", "text"), "doc_id", "text",
      statePath, 10)
    val after = rowsOf(IncrementalSegmentDedup.results(spark, statePath).get)
    assert(before == after)

    // a later doc repeating an already-claimed segment is deduped
    // against state, not just within its batch
    val claimedSeg = IncrementalSegmentDedup.claims(spark, statePath).get
      .select("seg").as[String].collect().head
    val probeId = all.last._1 + 1000
    IncrementalSegmentDedup.processBatch(
      Seq((probeId, claimedSeg)).toDF("doc_id", "text"),
      "doc_id", "text", statePath, 10)
    val probe = rowsOf(IncrementalSegmentDedup.results(spark, statePath).get)
      .find(_._1 == probeId).get
    assert(probe._3 == probe._2, "probe doc's segments should all drop")
  }

  test("crash between claims and results commits: replay reconstructs exactly") {
    val statePath = Files.createTempDirectory("graft-segcrash").toString
    val b1 = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"))
    val b2 = Seq((3L, "alpha beta gamma delta"), (4L, "unrelated words here"))
    def run(b: Seq[(Long, String)]): Unit =
      IncrementalSegmentDedup.processBatch(
        b.toDF("doc_id", "text"), "doc_id", "text", statePath, 3)
    def rows() = IncrementalSegmentDedup.results(spark, statePath).get
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq

    run(b1)
    val afterB1 = rows()
    // simulate the crash window: claims landed, results did not —
    // delete the results store and replay the SAME batch. Ownership
    // resolution must let the replay keep its own stored claims
    // instead of treating them as foreign and dropping everything.
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$statePath/results"))
    val claimsBefore = IncrementalSegmentDedup.claims(spark, statePath)
      .get.count()
    run(b1)
    assert(rows() == afterB1, "replay after crash window diverged")
    assert(IncrementalSegmentDedup.claims(spark, statePath).get.count()
      == claimsBefore, "replay must append no duplicate claims")

    // and the stream continues correctly past the recovered batch
    run(b2)
    val oneShot = graft.dedup.Dedup.segmentDedup(
      (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(rows() == oneShot)
  }
}
