package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{ConnectedComponents, Dedup}
import graft.sources.TestData
import graft.streaming.IncrementalNearDup

/** Streaming ≡ batch for NEAR-dup maintenance: feeding the real
  * documents table through micro-batches must converge to exactly the
  * clusters a one-shot batch recompute produces — same band keys, same
  * exact verification, same min-label components — while labels fold
  * in Δ-sized work per batch (the dynamic-table discipline applied to
  * dedup). */
class IncrementalNearDupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val P = IncrementalNearDup.Params(shingleLen = 1, numHashes = 32,
    numBands = 4, threshold = 0.7, maxBucket = 10000)

  private def referenceClusters() = {
    val docs = TestData.table(spark, sf, "documents").select("doc_id", "text")
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
      P.shingleLen, P.numHashes, P.numBands, P.threshold, P.maxBucket)
    ConnectedComponents.dupClusters(docs, "doc_id",
      pairs.select("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("streaming micro-batches converge to the one-shot batch clusters") {
    val docs = TestData.table(spark, sf, "documents").select("doc_id", "text")
    val statePath = Files.createTempDirectory("graft-incdedup-s").toString
    val ref = referenceClusters()

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = IncrementalNearDup.attach(
      stream.toDS().toDF("doc_id", "text"), "doc_id", "text", statePath, P,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    all.grouped(math.max(1, all.length / 3)).foreach { b =>
      stream.addData(b.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    val got = IncrementalNearDup.clusters(docs, "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref)
  }

  test("direct batch-incremental folds match, and a replayed batch is idempotent") {
    val docs = TestData.table(spark, sf, "documents").select("doc_id", "text")
    val statePath = Files.createTempDirectory("graft-incdedup-b").toString
    val ref = referenceClusters()

    val parts = docs.as[(Long, String)].collect().sortBy(_._1)
      .grouped(200).map(_.toSeq.toDF("doc_id", "text")).toSeq
    IncrementalNearDup.processBatch(parts(0), "doc_id", "text", statePath, P)
    // simulate a foreachBatch retry: the same batch replays in full
    IncrementalNearDup.processBatch(parts(0), "doc_id", "text", statePath, P)
    parts.drop(1).foreach(b =>
      IncrementalNearDup.processBatch(b, "doc_id", "text", statePath, P))

    val got = IncrementalNearDup.clusters(docs, "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref)

    // only the latest couple of label versions are retained
    val labelDirs = new java.io.File(s"$statePath/labels").list()
    assert(labelDirs.count(_.startsWith("v")) <= 2, labelDirs.mkString(","))
  }

  test("compaction collapses per-batch files, preserves state, and survives a crashed swap") {
    val statePath = Files.createTempDirectory("graft-incdedup-c").toString
    val Pc = P.copy(indexBuckets = 8)
    val docs = TestData.table(spark, sf, "documents").select("doc_id", "text")
    val parts = docs.as[(Long, String)].collect().sortBy(_._1)
      .grouped(200).map(_.toSeq.toDF("doc_id", "text")).toSeq
    parts.foreach(b =>
      IncrementalNearDup.processBatch(b, "doc_id", "text", statePath, Pc))

    // reader-visible files = the newest live version's listing; the
    // previous version is retained one generation (IndexDirs.retire),
    // so total on-disk counts may grow across a compaction
    def liveDir(): java.io.File = new java.io.File(
      graft.streaming.IndexDirs.currentDir(spark, s"$statePath/index").get)
    def fileCount(dir: java.io.File): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(dir).count(_.getName.endsWith(".parquet"))
    }
    def clusterMap() = IncrementalNearDup.clusters(docs, "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val before = clusterMap()
    val rowsBefore = IncrementalNearDup.bandIndex(spark, statePath).get.count()
    val dirBefore = liveDir()
    // pre-compact: appends are ONE L0 file per batch (never one per
    // bucket — the small-file discipline), nothing bucketed yet
    assert(fileCount(new java.io.File(dirBefore, "_l0")) == parts.length,
      "expected one L0 file per appended batch")
    IncrementalNearDup.compact(spark, statePath)
    val dirAfter = liveDir()
    assert(dirAfter != dirBefore, "compaction did not land a new version")
    // post-compact: L0 drained into the bucketed store, one sorted
    // run per bucket
    assert(fileCount(new java.io.File(dirAfter, "_l0")) == 0,
      "compaction left L0 files behind")
    val bucketDirs = dirAfter.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("pb=")).toSeq
    assert(bucketDirs.nonEmpty &&
      bucketDirs.forall(d => fileCount(d) == 1),
      "compaction did not leave one sorted run per bucket")
    assert(dirBefore.exists,
      "previous version not retained for in-flight readers")
    assert(IncrementalNearDup.bandIndex(spark, statePath).get.count()
      == rowsBefore, "compaction changed index content")
    assert(clusterMap() == before, "compaction changed clusters")

    // maintenance continues on the compacted layout: a near-dup of an
    // early doc still collides cross-batch
    val seedDoc = docs.orderBy("doc_id").head()
    val (seedId, seedText) = (seedDoc.getLong(0), seedDoc.getString(1))
    IncrementalNearDup.processBatch(
      Seq((2000000L, seedText)).toDF("doc_id", "text"),
      "doc_id", "text", statePath, Pc)
    val after = IncrementalNearDup.clusters(
        docs.select("doc_id").unionByName(Seq(2000000L).toDF("doc_id")),
        "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after(2000000L) == after(seedId),
      "post-compaction arrival missed its cross-batch twin")

    // crashed rewrite: a version dir whose _SUCCESS never landed is
    // invisible to readers, and the next compaction sweeps it
    val rowsNow = IncrementalNearDup.bandIndex(spark, statePath).get.count()
    val stale = graft.streaming.IndexDirs.nextDir(spark, s"$statePath/index")
    Seq((1L, Seq(2L), 0, 0L, 0)).toDF("__id", "__shh", "band", "key", "pb")
      .write.parquet(stale)
    assert(new java.io.File(s"$stale/_SUCCESS").delete())
    assert(IncrementalNearDup.bandIndex(spark, statePath).get.count()
      == rowsNow, "reader saw an unmarked (crashed) rewrite")
    IncrementalNearDup.compact(spark, statePath)
    assert(!new java.io.File(stale).exists,
      "crashed rewrite leftover not swept by the next compaction")
    assert(IncrementalNearDup.bandIndex(spark, statePath).get.count()
      == rowsNow, "compaction changed index content")
  }

  test("vacuum prunes label retention and sweeps crashed leftovers, labels unchanged") {
    val statePath = Files.createTempDirectory("graft-incdedup-v").toString
    val b1 = Seq((1L, "alpha beta gamma delta"), (2L, "zig zag")).toDF("doc_id", "text")
    val b2 = Seq((3L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val b3 = Seq((4L, "unrelated words entirely")).toDF("doc_id", "text")
    Seq(b1, b2, b3).foreach(b =>
      IncrementalNearDup.processBatch(b, "doc_id", "text", statePath, P))

    val labelsDir = new java.io.File(s"$statePath/labels")
    def dirs() = labelsDir.list().filter(_.startsWith("v")).sorted.toSeq
    // commit itself retains two: v1 (grace) + v2 (head)
    assert(dirs() == Seq("v1", "v2"), dirs().mkString(","))
    // plant a crashed UNCOMMITTED write below the head (its number is
    // never reused — without vacuum it lingers forever) and an
    // uncommitted dir above the head (a possibly in-flight writer)
    assert(new java.io.File(labelsDir, "v0/part-0").mkdirs())
    assert(new java.io.File(labelsDir, "v99/part-0").mkdirs())

    val before = IncrementalNearDup.labels(spark, statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    IncrementalNearDup.vacuum(spark, statePath, keep = 1)
    assert(dirs() == Seq("v2", "v99"), dirs().mkString(","))
    val after = IncrementalNearDup.labels(spark, statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after == before, "vacuum changed the current labeling")

    // maintenance continues: the next batch folds onto the vacuumed
    // store (its commit probes past the newest COMMITTED version, so
    // the spared uncommitted v99 is never adopted or overwritten)
    IncrementalNearDup.processBatch(
      Seq((5L, "alpha beta gamma delta zeta")).toDF("doc_id", "text"),
      "doc_id", "text", statePath, P)
    val got = IncrementalNearDup.clusters(
      Seq(1L, 3L, 5L).toDF("doc_id"), "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 1L && got(3L) == 1L && got(5L) == 1L)
  }

  test("cross-batch pairs are found: a near-dup arriving months later still clusters") {
    val statePath = Files.createTempDirectory("graft-incdedup-x").toString
    val b1 = Seq((1L, "alpha beta gamma delta"), (2L, "zig zag")).toDF("doc_id", "text")
    val b2 = Seq((3L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    IncrementalNearDup.processBatch(b1, "doc_id", "text", statePath, P)
    IncrementalNearDup.processBatch(b2, "doc_id", "text", statePath, P)
    val got = IncrementalNearDup.clusters(
      Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // jaccard(doc1, doc3) = 4/5 >= 0.7 → same cluster (min id 1)
    assert(got(1L) == 1L && got(3L) == 1L && got(2L) == 2L)
  }
}
