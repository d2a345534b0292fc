package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{CdcApply, PartitionedReplicatedTable}
import graft.dedup.Dedup
import graft.text.TextFunctions

/** Duplicate-SPAN statistics (d18 / [[Dedup.dupSpanStats]]) as
  * maintained state — the second NON-MONOTONE incremental view after
  * [[IncrementalCrossDocGrams]]: a new arrival can flip grams held by
  * OLD documents to cross-doc-duplicated, so old docs' coverage rows
  * must be REVISED (duplication is monotone under a growing corpus —
  * flags only ever turn ON — but the maintainer does not rely on it).
  * The state shape follows the cross-doc-grams maintainer exactly,
  * with one addition: the forward rows carry each doc's POSITIONED
  * occurrences, because a revision needs the positions for the
  * interval union, not just the gram set.
  *
  *  - `grams/` — inverted relation (gram → doc), one row per DISTINCT
  *    (doc, gram), hive-partitioned on `gb = xxhash64(gram) mod
  *    gramBuckets` ([[IndexDirs]]-versioned, append-only); per-batch
  *    probes are PARTITION-PRUNED by the batch's touched-bucket set.
  *    Distinct rows suffice for the cross-doc test (count per gram =
  *    distinct holding docs).
  *  - `results/` — forward relation (doc → occurrences + stats) as a
  *    [[PartitionedReplicatedTable]] keyed by doc id, partitioned on
  *    `rp = md5Bucket(id, resultParts)`: `occs` is the doc's full
  *    positioned-gram list `array<struct<g, pos>>` (bounded by the
  *    doc's own length — the same order as the gram arrays the d15
  *    maintainer stores), plus the published d18 columns.
  *
  * Per batch, exactly the docs whose coverage can have changed are
  * recomputed: the batch's own docs plus every stored holder of a
  * batch gram (a gram's distinct-doc count changes only when a batch
  * doc carries it). Docs shorter than n tokens contribute no grams but
  * DO get (and keep) their zero-coverage rows, so the maintained view
  * equals one-shot [[Dedup.dupSpanStats]] over ALL docs ingested so
  * far at every batch boundary, under any arrival order. Replays are
  * absorbed: the gram append anti-joins the probe, and the results
  * upsert rewrites identical values. Grams commit BEFORE results
  * (claims-before-results): a crash between the two replays into a
  * no-op append + a correct recompute. Single-writer per statePath.
  */
object IncrementalDupSpans {

  /** Same contract as [[IncrementalCrossDocGrams.Params]]; `n` is the
    * span gram width. */
  case class Params(n: Int = 5, gramBuckets: Int = 64,
                    resultParts: Int = 16, hashGrams: Boolean = false)

  private def gramsPath(statePath: String): String = s"$statePath/grams"

  /** Params are FROZEN per state dir (stored gb values, rp partition
    * assignments, gram encoding and the span width are all pure
    * functions of them) — sidecar-pinned, loud mismatch. */
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

  /** The accumulated inverted gram store — None before the first
    * commit. */
  def grams(spark: SparkSession, statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, gramsPath(statePath))

  /** Fold one document micro-batch. */
  def processBatch(docsBatch: DataFrame, idCol: String, textCol: String,
                   statePath: String, params: Params = Params()): Unit = {
    // In-batch dedup: the left_anti replay guard only absorbs
    // CROSS-batch duplicates — a batch carrying the same doc twice
    // would double its batchUniverse/occs rows and n_dup_grams.
    val newDocs = docsBatch.dropDuplicates(idCol)
    val spark = newDocs.sparkSession
    if (newDocs.isEmpty) return
    checkParams(spark, statePath, params)

    // Batch-side frames, pinned eagerly: lineage below spans both
    // stores across their commits (write-triggered recache would
    // otherwise recompute them against post-commit state).
    val posG = Dedup.positionedGramRows(newDocs, idCol, textCol,
        params.n, params.hashGrams)
      .select(col(idCol).as("doc_id"), col("__pos"), col("__g"))
      .localCheckpoint(true)
    val batchUniverse = newDocs.select(col(idCol).as("doc_id"),
        size(Dedup.spanTokens(col(textCol))).cast("long").as("n_tokens"))
      .localCheckpoint(true)
    val g = posG.select("doc_id", "__g").distinct()
      .withColumn("gb",
        pmod(xxhash64(col("__g")), lit(params.gramBuckets)).cast("int"))
      .localCheckpoint(true)

    // Δ-sized driver hop: touched buckets drive the pruned probe;
    // stored holders pinned PRE-append (the store grows below).
    val touched = g.select("gb").distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    val probe = (grams(spark, statePath) match {
      case Some(s) if touched.nonEmpty =>
        IncrementalCrossDocGrams.prunedGrams(s, touched)
          .join(g.select("__g").distinct(), "__g")
          .select("doc_id", "__g", "gb")
      case _ => g.limit(0)
    }).localCheckpoint(true)

    // grams FIRST (claims-before-results), replay-idempotent
    val newRows = g.join(probe, Seq("doc_id", "__g"), "left_anti")
    if (!newRows.isEmpty)
      newRows.write.mode("append").partitionBy("gb")
        .parquet(IndexDirs.prepareAppend(spark, gramsPath(statePath)))

    val res = resultsTable(spark, statePath)
    val oldIds = probe.select("doc_id")
      .join(batchUniverse.select("doc_id"), Seq("doc_id"), "left_anti")
      .distinct()
    val oldIdsEmpty = oldIds.isEmpty
    if (!res.isSnapshotDone)
      require(oldIdsEmpty,
        s"gram store at $statePath holds docs with no results table — " +
          "replay the interrupted batch before feeding new data")

    // Batch forward rows: every batch doc (short ones included, with
    // an empty occurrence list) carries its positioned occurrences.
    val batchOccs = posG.groupBy("doc_id")
      .agg(collect_list(struct(col("__g").as("g"), col("__pos").as("pos")))
        .as("occs"))
    val batchRows = batchUniverse.join(batchOccs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("occs"),
          array().cast(batchOccs.schema("occs").dataType)).as("occs"))
    // Old affected docs: forward rows give both the universe
    // (n_tokens) and the positioned occurrences a revision needs.
    val oldRows =
      if (res.isSnapshotDone && !oldIdsEmpty) {
        val rps = oldIds.select(rpOf(col("doc_id"), params).as("rp"))
          .distinct().collect().map(_.get(0)).toIndexedSeq
        res.currentForValues(rps).join(oldIds, "doc_id")
          .select("doc_id", "n_tokens", "occs")
          .localCheckpoint(true)
      } else batchRows.limit(0)
    val allRows = batchRows.unionByName(
      oldRows.select("doc_id", "n_tokens", "occs"))

    // Post-append doc-frequencies of exactly the affected occurrences'
    // grams (bucket-pruned; rows are distinct per (doc, gram), so
    // count(*) = distinct holding docs).
    val occRows = allRows.select(col("doc_id"),
      explode(col("occs")).as("__o"))
      .select(col("doc_id"), col("__o.pos").as("__pos"),
        col("__o.g").as("__g"))
    val gbsNeeded = occRows
      .select(pmod(xxhash64(col("__g")), lit(params.gramBuckets))
        .cast("int").as("gb"))
      .distinct().collect().map(_.getInt(0)).sorted.toIndexedSeq
    val freq = (grams(spark, statePath) match {
      case Some(s) if gbsNeeded.nonEmpty =>
        IncrementalCrossDocGrams.prunedGrams(s, gbsNeeded)
      case _ => g.limit(0)
    }).join(occRows.select("__g").distinct(), "__g")
      .groupBy("__g").agg(count(lit(1)).as("__nd"))

    val dupOccs = occRows.join(freq, "__g")
      .filter(col("__nd") >= 2).select("doc_id", "__pos")
    val statsRows = Dedup
      .dupSpanAgg(dupOccs, allRows.select("doc_id", "n_tokens"),
        "doc_id", params.n)
      .join(allRows.select("doc_id", "occs"), "doc_id")
      .withColumn("rp", rpOf(col("doc_id"), params))
      .localCheckpoint(true)

    if (!res.isSnapshotDone) res.snapshot(statsRows)
    else res.applyChanges(statsRows
      .withColumn(CdcApply.OpCol, lit(CdcApply.Update))
      .withColumn(CdcApply.LsnCol, lit(System.nanoTime()))
      .withColumn(CdcApply.CommitTsCol, current_timestamp()))
  }

  /** LSM-ish maintenance for the gram store; the results table
    * compacts through its own machinery. Same contract as
    * [[IncrementalCrossDocGrams.compact]]. */
  def compact(spark: SparkSession, statePath: String): Unit =
    IndexDirs.readIfExists(spark, gramsPath(statePath)).foreach { s =>
      val p = gramsPath(statePath)
      s.repartition(col("gb")).sortWithinPartitions("__g", "doc_id")
        .write.mode("overwrite").partitionBy("gb")
        .parquet(IndexDirs.nextDir(spark, p))
      IndexDirs.retire(spark, p)
    }

  /** Retention sweep for week-long streams — retire superseded
    * gram-store generations, vacuum the results table. */
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

  /** The maintained per-doc span statistics — the d18 output over
    * every doc ingested so far. None before the first commit. */
  def stats(spark: SparkSession, statePath: String): Option[DataFrame] = {
    val res = resultsTable(spark, statePath)
    if (!res.isSnapshotDone) None
    else Some(res.current().select("doc_id", "n_tokens", "n_dup_grams",
      "covered_tokens", "dup_fraction"))
  }
}
