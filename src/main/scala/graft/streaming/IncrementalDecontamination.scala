package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** FUZZY decontamination under the dynamic-table discipline (the d11
  * verdict as maintained state).
  *
  * The benchmark is static reference data and a doc's verdict — max
  * token-set jaccard against ANY benchmark doc — is a pure per-doc
  * function, so verdicts are MONOTONE under arrivals: once computed
  * they never change, and each micro-batch pays only Δ × benchmark
  * work (the exact cross-corpus PPJoin on the batch — per-batch
  * rarity ranks differ from the full-corpus ranks, but exactness is
  * rank-order-independent, so streaming ≡ batch EXACTLY, not
  * approximately). Compare [[IncrementalNearDup]], whose clusters
  * need cross-batch folds; here the state is an append-only flagged
  * set in an [[IndexDirs]]-versioned dir (replay-idempotent via
  * anti-join, crash-safe first-append hygiene).
  */
object IncrementalDecontamination {

  /** Versioned flags live under a child dir so stream checkpoints
    * (`$statePath/checkpoint`) stay siblings, outside the
    * [[IndexDirs]] version discipline. */
  private def flagsPath(statePath: String): String = s"$statePath/flags"

  /** Fold one document micro-batch: verdicts for the batch docs with
    * jaccard ≥ `tau` against the benchmark land in the flagged set.
    * `newDocs` and `bench` both carry (idCol, tokensCol) with
    * distinct-element token arrays. Single-writer per statePath, like
    * every maintained index. */
  def processBatch(newDocs: DataFrame, idCol: String, tokensCol: String,
                   bench: DataFrame, statePath: String,
                   tau: Double): Unit = {
    val spark = newDocs.sparkSession
    if (newDocs.isEmpty) return
    val verdicts = Dedup
      .jaccardJoinAcross(newDocs.select(col(idCol), col(tokensCol)),
        bench.select(col(idCol), col(tokensCol)), idCol, tokensCol, tau)
      .groupBy(col("a").as(idCol))
      .agg(count(lit(1)).as("n_bench_matches"),
           max(col("jaccard")).as("max_jaccard"))
    // replay idempotency: a re-delivered batch recomputes identical
    // verdicts; anything already flagged is dropped before the append
    val newRows = flagged(spark, statePath) match {
      case Some(old) => verdicts.join(old.select(idCol), Seq(idCol), "left_anti")
      case None => verdicts
    }
    if (!newRows.isEmpty)
      newRows.write.mode("append")
        .parquet(IndexDirs.prepareAppend(spark, flagsPath(statePath)))
  }

  /** Attach to a streaming tokenized-document source: one
    * [[processBatch]] per micro-batch (foreachBatch — replays are
    * anti-joined away, so exactly-once delivery is not required). */
  def attach(docs: DataFrame, idCol: String, tokensCol: String,
             bench: DataFrame, statePath: String, tau: Double,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.ProcessingTime(1000))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$statePath/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, tokensCol, bench, statePath, tau)
      }
      .start()

  /** The flagged set so far — None before the first commit. */
  def flagged(spark: org.apache.spark.sql.SparkSession,
              statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, flagsPath(statePath))

  /** One-shot batch reference: d11's verdicts over the whole corpus —
    * the equivalence target for the incremental fold. */
  def flaggedBatch(docs: DataFrame, idCol: String, tokensCol: String,
                   bench: DataFrame, tau: Double): DataFrame =
    Dedup.jaccardJoinAcross(docs.select(col(idCol), col(tokensCol)),
        bench.select(col(idCol), col(tokensCol)), idCol, tokensCol, tau)
      .groupBy(col("a").as(idCol))
      .agg(count(lit(1)).as("n_bench_matches"),
           max(col("jaccard")).as("max_jaccard"))
}
