package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IncrementalNearDup

/** The 100 TB posture of the streaming near-dup index: the per-batch
  * probe must be a PARTITION-PRUNED read of the accumulated band
  * index (only buckets the delta's band keys hash into), the append
  * must stay duplicate-free under foreachBatch replay, and probe
  * volume must stay ~flat when `indexBuckets` scales with the corpus
  * — the same bucket-count discipline every bucketed layout (Hive
  * buckets, LSM shards, the e03 ANN index) uses at scale. */
class StreamingDedupScaleSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Deterministic docs with per-doc-unique tokens: no true near-dups,
    * so index growth is pure background volume (collisions only by
    * band-hash accident — exactly the regime where pruning matters). */
  private def docs(from: Int, n: Int): DataFrame =
    (from until from + n).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"))
      .toDF("doc_id", "text")

  private def feed(statePath: String, p: IncrementalNearDup.Params,
                   total: Int, batch: Int): Unit = {
    (0 until total by batch).foreach(b =>
      IncrementalNearDup.processBatch(
        docs(b, math.min(batch, total - b)), "doc_id", "text", statePath, p))
    // drain L0 into the bucketed layout: partition-pruning claims are
    // about the POST-sweep steady state (pre-sweep probes read the
    // bounded L0 delta in full, by design)
    IncrementalNearDup.compact(spark, statePath)
  }

  private def scanOf(df: DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get

  test("probe read prunes to the delta's touched pb buckets") {
    val p = IncrementalNearDup.Params(indexBuckets = 32)
    val statePath = Files.createTempDirectory("graft-sds-prune").toString
    feed(statePath, p, total = 240, batch = 80)

    val delta = docs(100000, 3)
    val touched = IncrementalNearDup
      .bandRows(delta, "doc_id", "text", p, statePath)
      .select("pb").distinct().collect().map(_.getInt(0)).toIndexedSeq
    assert(touched.length <= 3 * p.numBands) // Δ-sized, ≤ one per band key

    val index = IncrementalNearDup.bandIndex(spark, statePath).get
    val pruned = IncrementalNearDup.prunedIndex(index, touched)

    val pf = scanOf(pruned).metadata("PartitionFilters")
    assert(pf.contains("pb"), s"probe not partition-pruned: $pf")

    // the pruned scan must list strictly fewer files than the index
    // holds (240 background docs × 4 bands spread over 32 buckets; a
    // 3-doc delta touches ≤ 12) — file-level skipping, not a scan +
    // filter
    val total = index.inputFiles.length
    val rows = pruned.collect().length.toLong // executes THIS plan → metrics
    val read = scanOf(pruned).metrics("numFiles").value
    assert(read < total, s"pruned probe read all $total files")
    // and row volume is the touched buckets' share, not the corpus
    val idxRows = index.count()
    assert(rows <= idxRows * (touched.length + 2) / p.indexBuckets + 100,
      s"pruned $rows of $idxRows rows — no pruning effect")
  }

  test("probe volume stays ~flat when indexBuckets scales with the corpus") {
    // corpus ×8 with buckets ×8: expected per-bucket volume is
    // unchanged, and a fixed delta touches the same NUMBER of buckets
    // — so probe rows stay ~constant while total index rows grow 8×.
    // This is the honest flat-probe claim: the knob that must grow
    // with the corpus is explicit, not implied.
    val small = IncrementalNearDup.Params(indexBuckets = 8)
    val big = IncrementalNearDup.Params(indexBuckets = 64)
    val s1 = Files.createTempDirectory("graft-sds-s1").toString
    val s2 = Files.createTempDirectory("graft-sds-s2").toString
    feed(s1, small, total = 100, batch = 50)
    feed(s2, big, total = 800, batch = 200)

    val delta = docs(200000, 2)
    def prunedRows(statePath: String, p: IncrementalNearDup.Params): Long = {
      val touched = IncrementalNearDup
        .bandRows(delta, "doc_id", "text", p, statePath)
        .select("pb").distinct().collect().map(_.getInt(0)).toIndexedSeq
      IncrementalNearDup.prunedIndex(
        IncrementalNearDup.bandIndex(spark, statePath).get, touched).count()
    }
    val r1 = prunedRows(s1, small)
    val r2 = prunedRows(s2, big)
    val i2 = IncrementalNearDup.bandIndex(spark, s2).get.count()
    assert(i2 >= 8 * 100 * 4 / 2, s"big corpus did not grow: $i2 rows")
    // flat within noise (bucket occupancy is hash-random): the 8×
    // corpus probe must NOT read 8× the rows — bound it at 3× the
    // small-corpus probe, and at a fraction of its own index
    assert(r2 <= math.max(3 * r1, 200), s"probe grew with corpus: $r1 -> $r2")
    assert(r2 <= i2 / 2, s"probe read $r2 of $i2 index rows")
  }

  test("replayed append leaves the index duplicate-free") {
    val p = IncrementalNearDup.Params(indexBuckets = 16)
    val statePath = Files.createTempDirectory("graft-sds-replay").toString
    val b = docs(0, 60)
    IncrementalNearDup.processBatch(b, "doc_id", "text", statePath, p)
    val once = IncrementalNearDup.bandIndex(spark, statePath).get.count()
    // foreachBatch retry after a crash between append and checkpoint
    IncrementalNearDup.processBatch(b, "doc_id", "text", statePath, p)
    val idx = IncrementalNearDup.bandIndex(spark, statePath).get
    assert(idx.count() == once, "replay re-appended existing rows")
    assert(idx.count() == idx.dropDuplicates("band", "key", "__id").count())
    // and a partially-committed append (some rows already present)
    // completes without duplicating them either
    val b2 = docs(60, 40)
    IncrementalNearDup.processBatch(b2.limit(15), "doc_id", "text", statePath, p)
    IncrementalNearDup.processBatch(b2, "doc_id", "text", statePath, p)
    val idx2 = IncrementalNearDup.bandIndex(spark, statePath).get
    assert(idx2.count() == idx2.dropDuplicates("band", "key", "__id").count())
  }

  test("in-flight label version dirs (no _SUCCESS) are invisible to readers") {
    val p = IncrementalNearDup.Params(indexBuckets = 16)
    val statePath = Files.createTempDirectory("graft-sds-succ").toString
    IncrementalNearDup.processBatch(docs(0, 20), "doc_id", "text", statePath, p)
    val before = IncrementalNearDup.labels(spark, statePath).count()
    // simulate a writer mid-flight: a higher version dir without a
    // _SUCCESS marker (only _temporary contents)
    val fake = new java.io.File(s"$statePath/labels/v99/_temporary")
    assert(fake.mkdirs())
    assert(IncrementalNearDup.labels(spark, statePath).count() == before,
      "reader picked up an incomplete label version")
  }
}
