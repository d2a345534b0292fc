package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sources.TestData
import graft.streaming.IncrementalDupSpans
import graft.streaming.IncrementalDupSpans.Params

/** d18 as maintained state — non-monotone IVM with POSITIONS: a late
  * twin flips an OLD doc's grams to cross-doc-duplicated, so its
  * coverage row must be revised from the stored positioned
  * occurrences; the maintained view must equal one-shot
  * [[Dedup.dupSpanStats]] over the docs seen so far at EVERY batch
  * boundary — including zero rows for docs shorter than n tokens. */
class StreamingDupSpansSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_tokens", "n_dup_grams", "covered_tokens",
        "dup_fraction")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .sortBy(_._1).toSeq

  test("maintained stats == one-shot d18 at every boundary; replay idempotent") {
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val statePath = Files.createTempDirectory("graft-dspan").toString

    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val batches = all.grouped(math.max(1, all.length / 3)).toSeq
    var seen = Seq.empty[(Long, String)]
    for (b <- batches) {
      IncrementalDupSpans.processBatch(
        b.toSeq.toDF("doc_id", "text"), "doc_id", "text", statePath)
      seen = seen ++ b
      val streaming = rowsOf(IncrementalDupSpans.stats(spark, statePath).get)
      val oneShot = rowsOf(Dedup.dupSpanStats(
        seen.toDF("doc_id", "text"), "doc_id", "text", 5))
      assert(streaming == oneShot,
        s"stats diverged after ${seen.length} docs")
    }
    val covered = IncrementalDupSpans.stats(spark, statePath).get
      .agg(sum("covered_tokens")).collect()(0).getLong(0)
    assert(covered > 0, "vacuous: no duplicated spans at this SF")

    // replaying the last batch changes nothing
    val before = rowsOf(IncrementalDupSpans.stats(spark, statePath).get)
    IncrementalDupSpans.processBatch(
      batches.last.toSeq.toDF("doc_id", "text"), "doc_id", "text", statePath)
    assert(rowsOf(IncrementalDupSpans.stats(spark, statePath).get) == before)
  }

  test("a doc delivered twice IN one batch does not double its universe/occs rows") {
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(40)
    val statePath = Files.createTempDirectory("graft-dspan-dup").toString
    // in-batch duplicates are invisible to the cross-batch left_anti
    IncrementalDupSpans.processBatch(
      docs.union(docs), "doc_id", "text", statePath)
    val streaming = rowsOf(IncrementalDupSpans.stats(spark, statePath).get)
    val oneShot = rowsOf(Dedup.dupSpanStats(docs, "doc_id", "text", 5))
    assert(streaming == oneShot, "duplicated batch rows leaked into state")
  }

  test("late twin revises an OLD doc's coverage; short docs keep zero rows") {
    val statePath = Files.createTempDirectory("graft-dspan2").toString
    def run(b: Seq[(Long, String)]): Unit =
      IncrementalDupSpans.processBatch(
        b.toDF("doc_id", "text"), "doc_id", "text", statePath)

    run(Seq((1L, "a b c d e f g h"), (2L, "p q r s t u")))
    assert(rowsOf(IncrementalDupSpans.stats(spark, statePath).get) == Seq(
      (1L, 8L, 0L, 0L, 0.0), (2L, 6L, 0L, 0L, 0.0)))

    // doc 3 shares doc 1's leading 7-token span: doc 1's stored row
    // must be revised to 3 dup grams covering 7 of its 8 tokens
    run(Seq((3L, "x a b c d e f g z w"), (4L, "m n o")))
    val second = rowsOf(IncrementalDupSpans.stats(spark, statePath).get)
    assert(second == Seq(
      (1L, 8L, 3L, 7L, 0.875), (2L, 6L, 0L, 0L, 0.0),
      (3L, 10L, 3L, 7L, 0.7), (4L, 3L, 0L, 0L, 0.0)))

    // equal to the one-shot over everything seen (incl. the short doc)
    val oneShot = rowsOf(Dedup.dupSpanStats(
      Seq((1L, "a b c d e f g h"), (2L, "p q r s t u"),
        (3L, "x a b c d e f g z w"), (4L, "m n o"))
        .toDF("doc_id", "text"), "doc_id", "text", 5))
    assert(second == oneShot)
  }

  test("crash between gram append and results commit: replay reconstructs") {
    val statePath = Files.createTempDirectory("graft-dspan3").toString
    def run(b: Seq[(Long, String)]): Unit =
      IncrementalDupSpans.processBatch(
        b.toDF("doc_id", "text"), "doc_id", "text", statePath)

    run(Seq((1L, "a b c d e f"), (2L, "a b c d e x")))
    val afterB1 = rowsOf(IncrementalDupSpans.stats(spark, statePath).get)
    val gramRows = spark.read.parquet(s"$statePath/grams/v0").count()

    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$statePath/results"))
    run(Seq((1L, "a b c d e f"), (2L, "a b c d e x")))
    assert(rowsOf(IncrementalDupSpans.stats(spark, statePath).get)
      == afterB1, "replay after crash window diverged")
    assert(spark.read.parquet(s"$statePath/grams/v0").count() == gramRows,
      "replay must append no duplicate gram rows")

    run(Seq((3L, "a b c d e y")))
    val oneShot = rowsOf(Dedup.dupSpanStats(
      Seq((1L, "a b c d e f"), (2L, "a b c d e x"), (3L, "a b c d e y"))
        .toDF("doc_id", "text"), "doc_id", "text", 5))
    assert(rowsOf(IncrementalDupSpans.stats(spark, statePath).get) == oneShot)
  }

  test("compact + vacuum preserve stats; stream continues; params frozen") {
    val statePath = Files.createTempDirectory("graft-dspan4").toString
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val all = docs.as[(Long, String)].collect().sortBy(_._1).take(300)
    def run(b: Seq[(Long, String)]): Unit =
      IncrementalDupSpans.processBatch(
        b.toDF("doc_id", "text"), "doc_id", "text", statePath)
    all.grouped(100).toSeq.foreach(b => run(b.toSeq))

    val before = rowsOf(IncrementalDupSpans.stats(spark, statePath).get)
    val filesBefore = IncrementalDupSpans
      .grams(spark, statePath).get.inputFiles.length
    IncrementalDupSpans.compact(spark, statePath)
    assert(IncrementalDupSpans.grams(spark, statePath).get
      .inputFiles.length <= filesBefore)
    assert(rowsOf(IncrementalDupSpans.stats(spark, statePath).get) == before,
      "compaction changed the maintained stats")
    IncrementalDupSpans.vacuum(spark, statePath, keep = 1)
    assert(rowsOf(IncrementalDupSpans.stats(spark, statePath).get) == before,
      "vacuum changed the maintained stats")

    run(Seq((999999L, "a totally fresh vacuum probe document here")))
    assert(IncrementalDupSpans.stats(spark, statePath).get.count()
      == before.length + 1)

    val e = intercept[IllegalArgumentException] {
      IncrementalDupSpans.processBatch(
        Seq((7L, "a b c d e g")).toDF("doc_id", "text"),
        "doc_id", "text", statePath, Params(gramBuckets = 128))
    }
    assert(e.getMessage.contains("frozen"))
  }

  test("attach() drives a real stream to one-shot equality") {
    val docs = TestData.table(spark, sf, "documents")
      .select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).take(300).toSeq
    val statePath = Files.createTempDirectory("graft-dspan-s").toString

    implicit val sq = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = IncrementalDupSpans.attach(
      stream.toDS().toDF("doc_id", "text"), "doc_id", "text", statePath,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    docs.grouped(math.max(1, docs.length / 2)).foreach { b =>
      stream.addData(b.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()

    val streaming = rowsOf(IncrementalDupSpans.stats(spark, statePath).get)
    val oneShot = rowsOf(Dedup.dupSpanStats(
      docs.toDF("doc_id", "text"), "doc_id", "text", 5))
    assert(streaming == oneShot)
  }

  test("hashGrams state form equals the string form") {
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val a = Files.createTempDirectory("graft-dspan5a").toString
    val b = Files.createTempDirectory("graft-dspan5b").toString
    IncrementalDupSpans.processBatch(docs, "doc_id", "text", a)
    IncrementalDupSpans.processBatch(docs, "doc_id", "text", b,
      Params(hashGrams = true))
    assert(rowsOf(IncrementalDupSpans.stats(spark, a).get)
      == rowsOf(IncrementalDupSpans.stats(spark, b).get))
  }
}
