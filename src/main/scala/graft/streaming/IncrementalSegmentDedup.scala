package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Passage-level exact dedup (d14 / [[Dedup.segmentDedup]]) as
  * maintained state: the corpus-wide "first claimant of each distinct
  * segment" relation is APPEND-ONLY under arrivals — a segment, once
  * claimed, never changes hands — so each micro-batch pays only
  * batch-local segmentation, one window over the batch's own
  * segments, and an anti-join against the claimed-segment store.
  * Docs are rebuilt at claim time and their output rows never need
  * revisiting (monotone, like [[IncrementalDecontamination]]'s
  * verdicts; unlike near-dup clusters, which fold across batches).
  *
  * Streaming ≡ one-shot [[Dedup.segmentDedup]] at every batch
  * boundary when docs arrive in id order (the CDC snapshot+tail
  * shape); under arbitrary arrival order the claimant is the earliest
  * ARRIVAL rather than the smallest id — the semantics a streaming
  * pipeline wants. State lives in two [[IndexDirs]]-versioned dirs
  * (claims + per-doc results); replays are anti-joined away on
  * doc_id, so exactly-once delivery is not required.
  */
object IncrementalSegmentDedup {

  private def claimsPath(statePath: String): String = s"$statePath/claims"
  private def resultsPath(statePath: String): String = s"$statePath/results"

  /** Fold one document micro-batch. Single-writer per statePath. */
  def processBatch(newDocs: DataFrame, idCol: String, textCol: String,
                   statePath: String, segLen: Int): Unit = {
    val spark = newDocs.sparkSession
    if (newDocs.isEmpty) return
    // replay idempotency: docs with committed results are done — their
    // claims are in the store and their output rows exist
    val fresh = results(spark, statePath) match {
      case Some(r) => newDocs.join(r.select(idCol), Seq(idCol), "left_anti")
      case None => newDocs
    }
    if (fresh.isEmpty) return
    val segs = Dedup.segments(fresh, idCol, textCol, segLen)
    // batch-local first occurrence per segment text...
    val w = Window.partitionBy("seg").orderBy(col(idCol), col("seg_idx"))
    val winners = segs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // ...keeps a segment if no earlier batch claimed it, OR if the
    // stored claimant is THIS (id, seg_idx) — ownership matters for
    // crash recovery: claims are committed BEFORE results (below), so
    // a crash between the writes replays the batch with its own
    // claims already in the store, and without the ownership check
    // every replayed segment would look foreign and be dropped.
    // `__new` marks genuinely new claims (the only rows appended, so
    // the replay appends nothing — idempotent).
    //
    // Materialized EAGERLY with a lineage-severing localCheckpoint:
    // both store writes below refresh any cached plan that references
    // their path, and this frame's lineage reaches BOTH stores
    // (results through `fresh`'s anti-join, claims through its own) —
    // a lazy (even cache()d) plan would be silently re-evaluated
    // against the post-write listings and collapse between the
    // writes.
    val claimed = (claims(spark, statePath) match {
      case Some(c) => winners.join(
          c.select(col("seg"), col(idCol).as("__cid"),
            col("seg_idx").as("__cidx")),
          Seq("seg"), "left")
        .filter(col("__cid").isNull ||
          (col("__cid") === col(idCol) && col("__cidx") === col("seg_idx")))
        .withColumn("__new", col("__cid").isNull)
        .drop("__cid", "__cidx")
      case None => winners.withColumn("__new", lit(true))
    }).localCheckpoint(true)
    // claims FIRST: a crash after this write replays into the
    // ownership path above; the reverse order would lose the claims
    // forever (results' doc anti-join would skip the docs for good)
    val newClaims = claimed.filter(col("__new"))
      .select(col("seg"), col(idCol), col("seg_idx"))
    if (!newClaims.isEmpty)
      newClaims.write.mode("append")
        .parquet(IndexDirs.prepareAppend(spark, claimsPath(statePath)))
    val marked = segs.join(
      claimed.select(col(idCol), col("seg_idx"), lit(1).as("__kept")),
      Seq(idCol, "seg_idx"), "left")
      .withColumn("__kept", coalesce(col("__kept"), lit(0)))
    Dedup.rebuildDocs(marked, idCol).write.mode("append")
      .parquet(IndexDirs.prepareAppend(spark, resultsPath(statePath)))
  }

  /** Attach to a streaming document source: one [[processBatch]] per
    * micro-batch. */
  def attach(docs: DataFrame, idCol: String, textCol: String,
             statePath: String, segLen: Int,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.ProcessingTime(1000))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$statePath/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, textCol, statePath, segLen)
      }
      .start()

  /** The claimed-segment store — None before the first commit. */
  def claims(spark: SparkSession, statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, claimsPath(statePath))

  /** Per-doc dedup results so far — None before the first commit. */
  def results(spark: SparkSession, statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, resultsPath(statePath))
}
