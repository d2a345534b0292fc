package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sources.TestData
import graft.streaming.IncrementalCrossDocGrams
import graft.streaming.IncrementalCrossDocGrams.Params

/** d15 as maintained state — the NON-MONOTONE case: a new arrival can
  * flip the shared-flag of grams held by OLD docs, so the maintainer
  * must revise existing rows, and the maintained stats must equal the
  * one-shot operator over the docs seen so far at EVERY batch
  * boundary. */
class StreamingCrossDocGramsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_grams", "n_shared_grams", "dup_gram_ratio")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq

  test("maintained stats == one-shot d15 at every boundary; replay idempotent") {
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val statePath = Files.createTempDirectory("graft-xdoc").toString

    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val batches = all.grouped(math.max(1, all.length / 3)).toSeq
    var seen = Seq.empty[(Long, String)]
    for (b <- batches) {
      IncrementalCrossDocGrams.processBatch(
        b.toSeq.toDF("doc_id", "text"), "doc_id", "text", statePath)
      seen = seen ++ b
      val streaming = rowsOf(
        IncrementalCrossDocGrams.stats(spark, statePath).get)
      val oneShot = rowsOf(Dedup.crossDocGramStats(
        seen.toDF("doc_id", "text"), "doc_id", "text", 5))
      assert(streaming == oneShot,
        s"stats diverged after ${seen.length} docs")
    }
    // the corpus actually contains cross-doc shared grams
    val shared = IncrementalCrossDocGrams.stats(spark, statePath).get
      .agg(sum("n_shared_grams")).collect()(0).getLong(0)
    assert(shared > 0, "vacuous: no cross-doc grams at this SF")

    // replaying the last batch changes nothing
    val before = rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
    IncrementalCrossDocGrams.processBatch(
      batches.last.toSeq.toDF("doc_id", "text"), "doc_id", "text", statePath)
    assert(rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
      == before)
  }

  test("late twin revises an OLD doc's ratio — the non-monotone case") {
    val statePath = Files.createTempDirectory("graft-xdoc2").toString
    def run(b: Seq[(Long, String)]): Unit =
      IncrementalCrossDocGrams.processBatch(
        b.toDF("doc_id", "text"), "doc_id", "text", statePath)

    run(Seq((1L, "a b c d e f"), (2L, "p q r s t u")))
    val first = rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
    assert(first == Seq((1L, 2L, 0L, 0.0), (2L, 2L, 0L, 0.0)))

    // doc 3 copies doc 1's leading window: doc 1's stored row must flip
    run(Seq((3L, "a b c d e x")))
    val second = rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
    assert(second == Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 0L, 0.0), (3L, 2L, 1L, 0.5)))

    // and equal to the one-shot over everything seen
    val oneShot = rowsOf(Dedup.crossDocGramStats(
      Seq((1L, "a b c d e f"), (2L, "p q r s t u"), (3L, "a b c d e x"))
        .toDF("doc_id", "text"), "doc_id", "text", 5))
    assert(second == oneShot)

    // short docs (< n tokens) contribute nothing and get no row
    run(Seq((4L, "a b c")))
    assert(rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
      == second)
  }

  test("crash between gram append and results commit: replay reconstructs") {
    val statePath = Files.createTempDirectory("graft-xdoc3").toString
    def run(b: Seq[(Long, String)]): Unit =
      IncrementalCrossDocGrams.processBatch(
        b.toDF("doc_id", "text"), "doc_id", "text", statePath)

    run(Seq((1L, "a b c d e f"), (2L, "a b c d e x")))
    val afterB1 = rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
    val gramRows = spark.read
      .parquet(s"$statePath/grams/v0").count()

    // simulate the crash window: grams landed, results did not
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$statePath/results"))
    run(Seq((1L, "a b c d e f"), (2L, "a b c d e x")))
    assert(rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
      == afterB1, "replay after crash window diverged")
    assert(spark.read.parquet(s"$statePath/grams/v0").count() == gramRows,
      "replay must append no duplicate gram rows")

    // stream continues correctly past the recovered batch
    run(Seq((3L, "a b c d e y")))
    val oneShot = rowsOf(Dedup.crossDocGramStats(
      Seq((1L, "a b c d e f"), (2L, "a b c d e x"), (3L, "a b c d e y"))
        .toDF("doc_id", "text"), "doc_id", "text", 5))
    assert(rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
      == oneShot)
  }

  test("compaction preserves stats and the stream continues") {
    val statePath = Files.createTempDirectory("graft-xdoc5").toString
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val all = docs.as[(Long, String)].collect().sortBy(_._1).take(300)
    val batches = all.grouped(100).toSeq
    def run(b: Seq[(Long, String)]): Unit =
      IncrementalCrossDocGrams.processBatch(
        b.toDF("doc_id", "text"), "doc_id", "text", statePath)
    batches.init.foreach(b => run(b.toSeq))

    val before = rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
    val filesBefore = IncrementalCrossDocGrams
      .grams(spark, statePath).get.inputFiles.length
    IncrementalCrossDocGrams.compact(spark, statePath)
    val filesAfter = IncrementalCrossDocGrams
      .grams(spark, statePath).get.inputFiles.length
    assert(filesAfter <= filesBefore)
    assert(rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
      == before, "compaction changed the maintained stats")

    run(batches.last.toSeq)
    val oneShot = rowsOf(Dedup.crossDocGramStats(
      all.toSeq.toDF("doc_id", "text"), "doc_id", "text", 5))
    assert(rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
      == oneShot, "post-compaction batch diverged")

    // vacuum drops the pre-compaction gram generation and the results
    // table's superseded versions; state and the next batch survive
    IncrementalCrossDocGrams.vacuum(spark, statePath, keep = 1)
    assert(rowsOf(IncrementalCrossDocGrams.stats(spark, statePath).get)
      == oneShot, "vacuum changed the maintained stats")
    run(Seq((999999L, "a totally fresh vacuum probe document here")))
    assert(IncrementalCrossDocGrams.stats(spark, statePath).get
      .count() == oneShot.length + 1, "post-vacuum batch failed")
  }

  test("probe read prunes to the delta's touched gb buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val statePath = Files.createTempDirectory("graft-xdoc6").toString
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    IncrementalCrossDocGrams.processBatch(
      docs, "doc_id", "text", statePath)

    // a 2-doc delta touches few of the 64 buckets
    val delta = Seq((900001L, "one tiny delta document arrives now ok"))
      .toDF("doc_id", "text")
    val touched = graft.dedup.Dedup
      .gramRows(delta, "doc_id", "text", 5, hashGrams = false)
      .select(pmod(xxhash64(col("__g")), lit(64)).cast("int").as("gb"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    assert(touched.nonEmpty && touched.length < 16)

    val store = IncrementalCrossDocGrams.grams(spark, statePath).get
    val pruned = IncrementalCrossDocGrams.prunedGrams(store, touched)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.metadata("PartitionFilters").contains("gb"),
      s"probe not partition-pruned: ${scan.metadata("PartitionFilters")}")
    pruned.collect()
    val total = store.inputFiles.length
    assert(scan.metrics("numFiles").value < total,
      s"pruned probe read all $total files")
  }

  test("params are frozen per state dir: drifted caller fails loudly") {
    val statePath = Files.createTempDirectory("graft-xdoc7").toString
    IncrementalCrossDocGrams.processBatch(
      Seq((1L, "a b c d e f")).toDF("doc_id", "text"),
      "doc_id", "text", statePath)
    val e = intercept[IllegalArgumentException] {
      IncrementalCrossDocGrams.processBatch(
        Seq((2L, "a b c d e g")).toDF("doc_id", "text"),
        "doc_id", "text", statePath, Params(gramBuckets = 128))
    }
    assert(e.getMessage.contains("frozen"))
    // the matching params still work
    IncrementalCrossDocGrams.processBatch(
      Seq((2L, "a b c d e g")).toDF("doc_id", "text"),
      "doc_id", "text", statePath)
    assert(IncrementalCrossDocGrams.stats(spark, statePath).get.count() == 2)
  }

  test("hashGrams state form equals the string form") {
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val a = Files.createTempDirectory("graft-xdoc4a").toString
    val b = Files.createTempDirectory("graft-xdoc4b").toString
    IncrementalCrossDocGrams.processBatch(docs, "doc_id", "text", a)
    IncrementalCrossDocGrams.processBatch(docs, "doc_id", "text", b,
      Params(hashGrams = true))
    assert(rowsOf(IncrementalCrossDocGrams.stats(spark, a).get)
      == rowsOf(IncrementalCrossDocGrams.stats(spark, b).get))
  }
}
