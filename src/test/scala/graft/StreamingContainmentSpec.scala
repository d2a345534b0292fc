package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sources.TestData
import graft.streaming.IncrementalContainment
import graft.text.TextFunctions

/** The j03 containment join as MAINTAINED state. The frozen
  * first-batch token order changes candidate SELECTIVITY only — the
  * prefix theorem holds under any fixed total order — so the
  * accumulated pair set must equal the one-shot batch join (which
  * re-ranks rare-first per corpus) at EVERY batch boundary, exactly. */
class StreamingContainmentSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("a", "b", "containment")
      .as[(Long, Long, Double)].collect().toSet

  test("streaming pair set == one-shot j03 at every boundary; replay adds nothing", Slow) {
    val params = IncrementalContainment.Params(threshold = 0.9)
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"),
        array_distinct(TextFunctions.tokens(col("text"))).as("w"))
    val statePath = Files.createTempDirectory("graft-cont").toString

    val all = docs.as[(Long, Seq[String])].collect().sortBy(_._1)
    val batches = all.grouped(math.max(1, all.length / 3)).toSeq
    var seen = Seq.empty[(Long, Seq[String])]
    for (b <- batches) {
      IncrementalContainment.processBatch(
        b.toSeq.toDF("doc_id", "w"), "doc_id", "w", statePath, params)
      seen = seen ++ b
      val streaming = pairsOf(IncrementalContainment.pairs(spark, statePath))
      val batch = pairsOf(Dedup.containmentJoin(
        seen.toDF("doc_id", "w"), "doc_id", "w", 0.9))
      assert(streaming == batch,
        s"after ${seen.length} docs: missed ${(batch -- streaming).size}, " +
          s"extra ${(streaming -- batch).size}")
      assert(streaming.nonEmpty, "vacuous boundary: no pairs at this SF")
    }

    // cross-batch coverage is real: some pair spans two batches
    val b1Ids = batches.head.map(_._1).toSet
    val streaming = pairsOf(IncrementalContainment.pairs(spark, statePath))
    assert(streaming.exists(p =>
      b1Ids.contains(p._1) != b1Ids.contains(p._2)),
      "no cross-batch pair — the probe path went untested")

    // replaying the last batch is a no-op on EVERY store (docs
    // included — its replay guard prunes by the delta's own buckets,
    // not the candidates', which are empty on a pure replay)
    def storeCounts() = (
      IncrementalContainment.pairs(spark, statePath).count(),
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$statePath/postings").count(),
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$statePath/docs").count())
    val countsBefore = storeCounts()
    IncrementalContainment.processBatch(
      batches.last.toSeq.toDF("doc_id", "w"), "doc_id", "w", statePath, params)
    val countsAfter = storeCounts()
    assert(countsBefore == countsAfter,
      s"replay mutated state: $countsBefore -> $countsAfter")
  }

  test("asymmetric cross-batch directions: small-then-big and big-then-small") {
    val params = IncrementalContainment.Params(threshold = 1.0)
    val statePath = Files.createTempDirectory("graft-cont-dir").toString
    val long1 = (0 until 40).map(i => s"a$i")
    val long2 = (0 until 40).map(i => s"z$i")
    // batch 1: a small doc (later contained in a big arrival) and a
    // big doc (later containing a small arrival); plus noise
    IncrementalContainment.processBatch(
      Seq((1L, long1.take(6)), (2L, long2),
          (3L, Seq("n1", "n2", "n3"))).toDF("doc_id", "w"),
      "doc_id", "w", statePath, params)
    assert(pairsOf(IncrementalContainment.pairs(spark, statePath)).isEmpty)
    // batch 2: the big partner of doc 1 — WITH tokens unseen in batch
    // 1 (exercises the hash-coded fallback half of the frozen order) —
    // and the small partner of doc 2
    IncrementalContainment.processBatch(
      Seq((10L, long1 ++ Seq("new1", "new2")), (11L, long2.slice(5, 11)))
        .toDF("doc_id", "w"),
      "doc_id", "w", statePath, params)
    val got = pairsOf(IncrementalContainment.pairs(spark, statePath))
    assert(got == Set((1L, 10L, 1.0), (2L, 11L, 1.0)), s"got $got")
  }

  test("compact preserves pairs and keeps the probe path working; retrain is output-invariant") {
    val params = IncrementalContainment.Params(threshold = 0.9)
    val docs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"),
        array_distinct(TextFunctions.tokens(col("text"))).as("w"))
    val statePath = Files.createTempDirectory("graft-cont-compact").toString
    val all = docs.as[(Long, Seq[String])].collect().sortBy(_._1)
    val (h1, h2) = all.splitAt(all.length / 2)

    IncrementalContainment.processBatch(
      h1.toSeq.toDF("doc_id", "w"), "doc_id", "w", statePath, params)
    val before = pairsOf(IncrementalContainment.pairs(spark, statePath))
    IncrementalContainment.compact(spark, statePath)
    assert(pairsOf(IncrementalContainment.pairs(spark, statePath)) == before)

    // retrain re-freezes the ranking on the accumulated corpus; the
    // pair set is order-independent so nothing may change...
    IncrementalContainment.retrain(
      h1.toSeq.toDF("doc_id", "w"), "doc_id", "w", statePath, params)
    assert(pairsOf(IncrementalContainment.pairs(spark, statePath)) == before)

    // ...and the NEXT batch folds correctly through the retrained index
    IncrementalContainment.processBatch(
      h2.toSeq.toDF("doc_id", "w"), "doc_id", "w", statePath, params)
    val streaming = pairsOf(IncrementalContainment.pairs(spark, statePath))
    val batch = pairsOf(Dedup.containmentJoin(
      all.toSeq.toDF("doc_id", "w"), "doc_id", "w", 0.9))
    assert(streaming == batch,
      s"post-retrain fold diverged: missed ${(batch -- streaming).size}, " +
        s"extra ${(streaming -- batch).size}")
    IncrementalContainment.vacuum(spark, statePath)
    assert(pairsOf(IncrementalContainment.pairs(spark, statePath)) == streaming)
  }
}
