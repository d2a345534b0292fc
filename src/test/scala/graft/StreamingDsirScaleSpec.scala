package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IncrementalDsir
import graft.text.TextFunctions

/** The IncrementalDsir scale contract: per-batch reads are PARTITION-
  * PRUNED file listings (docs-store replay guard on `db`, frozen-model
  * weights probe on `fb`), not scans-plus-filters — the property that
  * keeps batch cost Δ-sized as the accumulated state grows. */
class StreamingDsirScaleSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val params = IncrementalDsir.Params(featBuckets = 32,
    docParts = 16)

  // every 10th doc is target; disjoint content vocabulary per doc
  private def docs(from: Int, n: Int): DataFrame =
    (from until from + n).map(i =>
      (i.toLong, s"v${i}a v${i}b v${i}c v${i}d",
       if (i % 10 == 0) "t" else "r"))
      .toDF("doc_id", "text", "grp")

  private def feed(statePath: String, total: Int, batch: Int): Unit =
    (0 until total by batch).foreach(b =>
      IncrementalDsir.processBatch(docs(b, math.min(batch, total - b)),
        "doc_id", "text", col("grp") === "t", statePath, params))

  private def scanOf(df: DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get

  test("replay guard and weights probe are partition-pruned reads") {
    val statePath = Files.createTempDirectory("graft-dsir-scale").toString
    feed(statePath, total = 200, batch = 50)

    // ---- docs-store replay guard: prune on the delta's db buckets
    val delta = docs(100000, 3)
    val touchedDb = delta
      .select(TextFunctions.md5Bucket(col("doc_id"), params.docParts)
        .as("db")).distinct().collect().map(_.getInt(0)).toIndexedSeq
    val store = IncrementalDsir.docsStore(spark, statePath).get
    val prunedStore = store.filter(col("db").isin(touchedDb: _*))
    val pfD = scanOf(prunedStore).metadata("PartitionFilters")
    assert(pfD.contains("db"), s"docs guard not partition-pruned: $pfD")
    prunedStore.collect()
    assert(scanOf(prunedStore).metrics("numFiles").value
      < store.inputFiles.length.toLong,
      "docs guard listed every store file")

    // ---- weights probe: prune on the delta's feature buckets
    val touchedFb = delta
      .select(explode(TextFunctions.tokens(col("text"))).as("__w"))
      .select(pmod(xxhash64(col("__w")), lit(params.featBuckets.toLong))
        .cast("int").as("fb"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    val weights = IncrementalDsir.weightsWithFb(spark, statePath).get
    val prunedW = weights.filter(col("fb").isin(touchedFb: _*))
    val pfW = scanOf(prunedW).metadata("PartitionFilters")
    assert(pfW.contains("fb"), s"weights probe not partition-pruned: $pfW")
    prunedW.collect()
    assert(scanOf(prunedW).metrics("numFiles").value
      < weights.inputFiles.length.toLong,
      "weights probe listed every model file")
  }

  test("batch fold cost is delta-shaped: a replayed batch appends nothing " +
      "as the store grows") {
    val statePath = Files.createTempDirectory("graft-dsir-scale2").toString
    feed(statePath, total = 120, batch = 40)
    val files = IncrementalDsir.docsStore(spark, statePath)
      .get.inputFiles.length
    // replay the middle batch: both guards absorb it — zero new files
    IncrementalDsir.processBatch(docs(40, 40), "doc_id", "text",
      col("grp") === "t", statePath, params)
    assert(IncrementalDsir.docsStore(spark, statePath)
      .get.inputFiles.length == files, "replay appended files")
  }

  test("compact bounds docs-store file counts; content and folds survive") {
    val statePath = Files.createTempDirectory("graft-dsir-scale3").toString
    feed(statePath, total = 120, batch = 20) // 6 batches of small files
    val before = IncrementalDsir.docsStore(spark, statePath).get
    val rows = before.count()
    val filesBefore = before.inputFiles.length
    IncrementalDsir.compact(spark, statePath)
    IncrementalDsir.vacuum(spark, statePath, keep = 1)
    val after = IncrementalDsir.docsStore(spark, statePath).get
    assert(after.count() == rows, "compact changed the stored rows")
    assert(after.inputFiles.length < filesBefore,
      s"compact did not reduce files (${after.inputFiles.length})")
    // the maintainer still folds and retrains correctly on the
    // compacted layout
    IncrementalDsir.processBatch(docs(120, 20), "doc_id", "text",
      col("grp") === "t", statePath, params)
    IncrementalDsir.retrain(spark, statePath, "doc_id", params)
    val scored = IncrementalDsir.scores(spark, statePath).get.count()
    assert(scored == (0 until 140).count(_ % 10 != 0).toLong)
  }
}
