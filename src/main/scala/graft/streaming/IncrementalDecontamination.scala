package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** FUZZY decontamination under the dynamic-table discipline (the
  * d11/d16 verdicts as maintained state).
  *
  * The benchmark is static reference data and a doc's verdict — max
  * token-set similarity against ANY benchmark doc — is a pure per-doc
  * function, so verdicts are MONOTONE under arrivals: once computed
  * they never change, and each micro-batch pays only Δ × benchmark
  * work (the exact cross-corpus join on the batch — per-batch
  * rarity ranks differ from the full-corpus ranks, but exactness is
  * rank-order-independent, so streaming ≡ batch EXACTLY, not
  * approximately). Compare [[IncrementalNearDup]], whose clusters
  * need cross-batch folds; here the state is an append-only flagged
  * set in an [[IndexDirs]]-versioned dir (replay-idempotent via
  * anti-join, crash-safe first-append hygiene).
  *
  * Two metrics, one discipline: symmetric jaccard (d11 — paraphrased
  * near-twins of benchmark docs) and `containment = true` for the
  * overlap coefficient (d16 — short benchmark items embedded in long
  * training docs, which jaccard scores at ≈ the size ratio). The
  * score column is `max_jaccard` / `max_containment` respectively, so
  * the two state dirs are self-describing; run one maintainer per
  * metric on its own statePath.
  */
object IncrementalDecontamination {

  /** Versioned flags live under a child dir so stream checkpoints
    * (`$statePath/checkpoint`) stay siblings, outside the
    * [[IndexDirs]] version discipline. */
  private def flagsPath(statePath: String): String = s"$statePath/flags"

  private def verdicts(docs: DataFrame, idCol: String, tokensCol: String,
                       bench: DataFrame, tau: Double,
                       containment: Boolean): DataFrame = {
    val d = docs.select(col(idCol), col(tokensCol))
    val b = bench.select(col(idCol), col(tokensCol))
    val (pairs, score) =
      if (containment)
        (Dedup.containmentJoinAcross(d, b, idCol, tokensCol, tau),
          "containment")
      else (Dedup.jaccardJoinAcross(d, b, idCol, tokensCol, tau), "jaccard")
    pairs.groupBy(col("a").as(idCol))
      .agg(count(lit(1)).as("n_bench_matches"),
           max(col(score)).as(s"max_$score"))
  }

  /** Fold one document micro-batch: verdicts for the batch docs with
    * similarity ≥ `tau` against the benchmark land in the flagged set.
    * `newDocs` and `bench` both carry (idCol, tokensCol) with
    * distinct-element token arrays. Single-writer per statePath, like
    * every maintained index. */
  def processBatch(docsBatch: DataFrame, idCol: String, tokensCol: String,
                   bench: DataFrame, statePath: String,
                   tau: Double, containment: Boolean = false): Unit = {
    // In-batch dedup: the flagged anti-join only absorbs CROSS-batch
    // replays — a doc delivered twice in one batch would double every
    // pair it generates and inflate n_bench_matches.
    val newDocs = docsBatch.dropDuplicates(idCol)
    val spark = newDocs.sparkSession
    if (newDocs.isEmpty) return
    val batch = verdicts(newDocs, idCol, tokensCol, bench, tau, containment)
    // replay idempotency: a re-delivered batch recomputes identical
    // verdicts; anything already flagged is dropped before the append
    val newRows = flagged(spark, statePath) match {
      case Some(old) => batch.join(old.select(idCol), Seq(idCol), "left_anti")
      case None => batch
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
             containment: Boolean = false,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.ProcessingTime(1000))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$statePath/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, tokensCol, bench, statePath, tau,
          containment)
      }
      .start()

  /** The flagged set so far — None before the first commit. */
  def flagged(spark: org.apache.spark.sql.SparkSession,
              statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, flagsPath(statePath))

  /** One-shot batch reference: the d11 (or, with `containment`, d16)
    * verdicts over the whole corpus — the equivalence target for the
    * incremental fold. */
  def flaggedBatch(docs: DataFrame, idCol: String, tokensCol: String,
                   bench: DataFrame, tau: Double,
                   containment: Boolean = false): DataFrame =
    verdicts(docs, idCol, tokensCol, bench, tau, containment)
}
