package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{CdcApply, PartitionedReplicatedTable}
import graft.dedup.Dedup
import graft.text.TextFunctions

/** Cross-document duplicate-gram statistics (d15 /
  * [[Dedup.crossDocGramStats]]) as maintained state — a genuinely
  * NON-MONOTONE incremental view: a new arrival can flip the
  * shared-flag of grams held by OLD documents, so (unlike the
  * decontamination verdicts or the claimed-segment relation) existing
  * output rows must be REVISED. The maintained-state shape:
  *
  *  - `grams/` — the inverted relation (gram → doc), one row per
  *    distinct (doc, gram), hive-partitioned on `gb = xxhash64(gram)
  *    mod gramBuckets` ([[IndexDirs]]-versioned, append-only). Probes
  *    are PARTITION-PRUNED: each batch collects its touched `gb` set
  *    (Δ-sized, ≤ gramBuckets ints) driver-side and scans only those
  *    directories — the [[IncrementalNearDup]] index discipline.
  *  - `results/` — the forward relation (doc → gram array + stats) as
  *    a [[PartitionedReplicatedTable]] keyed by the doc id,
  *    partitioned on `rp = md5Bucket(id, resultParts)` (pure key
  *    function, so a key never migrates partitions): per-batch
  *    revisions upsert through the CDC merge, touching only the
  *    partitions holding affected docs.
  *
  * Per batch: exactly the docs whose stats can have changed are
  * recomputed — the batch's own docs plus every stored doc sharing a
  * gram with the batch (any gram whose doc-frequency changed is a
  * batch gram, and every holder of a batch gram is in the pruned
  * probe, so untouched docs' stats are provably unchanged). Batch
  * cost is Δ × pruned-probe work, never a corpus rescan.
  *
  * Streaming ≡ one-shot [[Dedup.crossDocGramStats]] at EVERY batch
  * boundary under ANY arrival order (the stats depend on the SET of
  * ingested docs only — stronger than the arrival-order-dependent
  * segment claims). Replays are absorbed: the gram append is
  * deduplicated against the pruned probe (same probe the batch
  * already pays for), and the results upsert rewrites identical
  * values. Grams commit BEFORE results (the claims-before-results
  * ordering): a crash between the two replays into a no-op append +
  * a correct recompute, never a duplicated gram row.
  */
object IncrementalCrossDocGrams {

  /** @param n            gram width (tokens)
    * @param gramBuckets  hive buckets of the inverted gram store
    * @param resultParts  partitions of the per-doc results table
    * @param hashGrams    store xxhash64 longs instead of gram strings
    *                     (the scale form — same contract as the batch
    *                     side's `hashGrams`) */
  case class Params(n: Int = 5, gramBuckets: Int = 64,
                    resultParts: Int = 16, hashGrams: Boolean = false)

  private def gramsPath(statePath: String): String = s"$statePath/grams"

  /** Params are FROZEN per state dir: stored gb values, rp partition
    * assignments, and the gram encoding are all pure functions of
    * them, so a drifted caller (different gramBuckets, resultParts,
    * hashGrams, or n) would silently miss stored holders in the
    * pruned probe and migrate keys between result partitions. The
    * first batch writes a sidecar; every later call must match it —
    * corruption becomes a loud require instead. */
  private def checkParams(spark: SparkSession, statePath: String,
                          p: Params): Unit =
    IndexDirs.checkParams(spark, statePath,
      s"n=${p.n};gramBuckets=${p.gramBuckets};" +
        s"resultParts=${p.resultParts};hashGrams=${p.hashGrams}")

  private def resultsTable(spark: SparkSession,
                           statePath: String): PartitionedReplicatedTable =
    new PartitionedReplicatedTable(spark, s"$statePath/results",
      Seq("doc_id"), "rp")

  private def rpOf(c: org.apache.spark.sql.Column, p: Params) =
    TextFunctions.md5Bucket(c, p.resultParts)

  /** Partition-pruned view of the gram store: a literal `isin` on the
    * hive partition column, so the touched directories are selected at
    * PLANNING time (PartitionFilters — unmatched buckets never listed
    * into the scan). */
  private[graft] def prunedGrams(store: DataFrame,
                                 touched: Seq[Int]): DataFrame =
    store.filter(col("gb").isin(touched: _*))

  /** The accumulated gram store — None before the first commit. */
  def grams(spark: SparkSession, statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, gramsPath(statePath))

  /** Fold one document micro-batch. Single-writer per statePath. */
  def processBatch(newDocs: DataFrame, idCol: String, textCol: String,
                   statePath: String, params: Params = Params()): Unit = {
    val spark = newDocs.sparkSession
    if (newDocs.isEmpty) return
    checkParams(spark, statePath, params)
    // batch gram rows, bucketed; materialized eagerly (batch-sized) —
    // the lineage below spans both stores across their commits
    val g = Dedup.gramRows(newDocs, idCol, textCol, params.n,
        params.hashGrams)
      .select(col(idCol).as("doc_id"), col("__g"))
      .distinct()
      .withColumn("gb",
        pmod(xxhash64(col("__g")), lit(params.gramBuckets)).cast("int"))
      .localCheckpoint(true)
    if (g.isEmpty) return // all docs below n tokens: no output rows

    // Δ-sized driver hop: touched buckets drive the pruned probe
    val touched = g.select("gb").distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    // stored holders of batch grams — pinned PRE-append (the store
    // grows below, and this frame decides what the append adds)
    val probe = (grams(spark, statePath) match {
      case Some(s) => prunedGrams(s, touched)
        .join(g.select("__g").distinct(), "__g")
        .select("doc_id", "__g", "gb")
      case None => g.limit(0)
    }).localCheckpoint(true)

    // grams FIRST (claims-before-results): replay-idempotent via the
    // probe anti-join — a replayed batch finds its own rows stored
    val newRows = g.join(probe, Seq("doc_id", "__g"), "left_anti")
    if (!newRows.isEmpty)
      newRows.write.mode("append").partitionBy("gb")
        .parquet(IndexDirs.prepareAppend(spark, gramsPath(statePath)))

    // affected docs = batch docs ∪ stored holders of batch grams;
    // old docs' gram sets come from the results table's forward
    // arrays (pruned to the partitions holding affected docs) —
    // distinct() collapses the replay case where a doc appears in
    // both sources with the identical set
    val res = resultsTable(spark, statePath)
    val oldIds = probe.select("doc_id")
      .join(g.select("doc_id"), Seq("doc_id"), "left_anti").distinct()
    val oldIdsEmpty = oldIds.isEmpty
    // an interrupted FIRST batch may replay with its own grams stored
    // and no results table yet (oldIds empty — probe docs are the
    // batch's own); stored docs from a DIFFERENT batch with no results
    // table means the caller fed new data instead of replaying the
    // interrupted batch — their rows (and gram arrays future
    // revisions need) would be silently lost, so fail loudly
    if (!res.isSnapshotDone)
      require(oldIdsEmpty,
        s"gram store at $statePath holds docs with no results table — " +
          "replay the interrupted batch before feeding new data")
    val oldGrams =
      if (res.isSnapshotDone && !oldIdsEmpty) {
        val rps = oldIds.select(rpOf(col("doc_id"), params).as("rp"))
          .distinct().collect().map(_.get(0)).toIndexedSeq
        res.currentForValues(rps)
          .join(oldIds, "doc_id")
          .select(col("doc_id"), explode(col("grams")).as("__g"))
      } else g.select("doc_id", "__g").limit(0)
    val affected = g.select("doc_id", "__g").union(oldGrams).distinct()

    // post-append doc-frequencies of exactly the affected docs' grams
    // (bucket-pruned; the store now includes this batch)
    val gbsNeeded = affected
      .select(pmod(xxhash64(col("__g")), lit(params.gramBuckets))
        .cast("int").as("gb"))
      .distinct().collect().map(_.getInt(0)).sorted.toIndexedSeq
    val freq = prunedGrams(grams(spark, statePath).get, gbsNeeded)
      .join(affected.select("__g").distinct(), "__g")
      .groupBy("__g").agg(count(lit(1)).as("__nd"))

    // revised rows for every affected doc — one aggregate carrying
    // stats AND the forward gram array the next revision will need
    val statsRows = affected.join(freq, "__g")
      .groupBy("doc_id")
      .agg(collect_list(col("__g")).as("grams"),
           count(lit(1)).cast("long").as("n_grams"),
           sum(when(col("__nd") >= 2, 1).otherwise(0)).cast("long")
             .as("n_shared_grams"),
           round(sum(when(col("__nd") >= 2, 1).otherwise(0))
               .cast("double") / count(lit(1)), 4)
             .as("dup_gram_ratio"))
      .withColumn("rp", rpOf(col("doc_id"), params))
      .localCheckpoint(true)

    if (!res.isSnapshotDone) res.snapshot(statsRows)
    else res.applyChanges(statsRows
      .withColumn(CdcApply.OpCol, lit(CdcApply.Update))
      .withColumn(CdcApply.LsnCol, lit(System.nanoTime()))
      .withColumn(CdcApply.CommitTsCol, current_timestamp()))
  }

  /** LSM-ish maintenance: rewrite the accumulated gram store into one
    * sorted run per bucket (per-batch appends leave a file per batch
    * per touched bucket). Next version dir + [[IndexDirs.retire]], so
    * a concurrent reader holding the old listing still completes; a
    * crash mid-write leaves an unmarked directory readers ignore. The
    * results table compacts through its own machinery
    * (`PartitionedReplicatedTable.optimize`/`vacuum`). */
  def compact(spark: SparkSession, statePath: String): Unit =
    IndexDirs.readIfExists(spark, gramsPath(statePath)).foreach { s =>
      val p = gramsPath(statePath)
      s.repartition(col("gb")).sortWithinPartitions("__g", "doc_id")
        .write.mode("overwrite").partitionBy("gb")
        .parquet(IndexDirs.nextDir(spark, p))
      IndexDirs.retire(spark, p)
    }

  /** Maintenance sweep for week-long streams: retire superseded gram-
    * store generations left by [[compact]] ([[IndexDirs.retire]] —
    * crashed-rewrite leftovers included) and vacuum the results
    * table's superseded partition versions / old manifests / crashed
    * staging dirs (`PartitionedReplicatedTable.vacuum`). Same
    * single-writer + reader-grace contract as the other maintainers;
    * run between batches. */
  def vacuum(spark: SparkSession, statePath: String, keep: Int = 2): Unit = {
    IndexDirs.retire(spark, gramsPath(statePath), keep = keep)
    val res = resultsTable(spark, statePath)
    if (res.isSnapshotDone) res.vacuum(keepManifests = keep)
  }

  /** Attach to a streaming document source: one [[processBatch]] per
    * micro-batch. */
  def attach(docs: DataFrame, idCol: String, textCol: String,
             statePath: String, params: Params = Params(),
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.ProcessingTime(1000))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$statePath/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, textCol, statePath, params)
      }
      .start()

  /** The maintained per-doc statistics — the d15 output over every doc
    * ingested so far. None before the first commit. */
  def stats(spark: SparkSession, statePath: String): Option[DataFrame] = {
    val res = resultsTable(spark, statePath)
    if (!res.isSnapshotDone) None
    else Some(res.current()
      .select("doc_id", "n_grams", "n_shared_grams", "dup_gram_ratio"))
  }
}
