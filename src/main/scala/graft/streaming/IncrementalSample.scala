package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Mixture

/** The d08/d10 weighted sample as a MAINTAINED reservoir: k docs per
  * stratum with P(pick) ∝ weight over EVERYTHING seen so far, kept
  * fresh per micro-batch.
  *
  * Why this streams exactly: the A-ES priority is a pure function of
  * (key, weight), and "weighted sample without replacement" = "k
  * smallest priorities per stratum" — an idempotent, commutative,
  * associative fold (a min-k set). So the maintained state is just
  * the current winners (|strata| × k rows), each batch folds via
  * union + re-take-k in one tiny aggregation, replays are absorbed
  * (re-union of the same elements changes nothing), and the state
  * after any arrival order equals the one-shot batch sample — the
  * reservoir-sampling guarantee with zero RNG state to checkpoint.
  *
  * State lands as an [[IndexDirs]]-versioned full rewrite per batch
  * (the state IS k-bounded — rewriting it is cheaper than appending),
  * so readers get snapshot isolation and crashed writes stay
  * invisible.
  */
object IncrementalSample {

  /** The versioned reservoir lives under a child dir so stream
    * checkpoints (`$statePath/checkpoint`) stay siblings, outside the
    * [[IndexDirs]] version discipline. */
  private def reservoirPath(statePath: String): String = s"$statePath/reservoir"

  /** Fold one micro-batch of (keyCol, stratumCol, weightCol) rows. */
  def processBatch(newDocs: DataFrame, keyCol: String, stratumCol: String,
                   weightCol: String, k: Int, statePath: String): Unit = {
    val spark = newDocs.sparkSession
    if (newDocs.isEmpty) return
    val batchTop = Mixture
      .weightedSampleAgg(newDocs, keyCol, stratumCol, weightCol, k)
      .select(col(stratumCol), col(keyCol), col(weightCol), col("priority"))
    val folded = current(spark, statePath) match {
      case Some(st) => st.select(stratumCol, keyCol, weightCol, "priority")
        .unionByName(batchTop)
        // re-take-k over the union; dropDuplicates absorbs replays
        // (same key → same priority, a pure function)
        .dropDuplicates(stratumCol, keyCol)
      case None => batchTop
    }
    val winners = ranked(folded, keyCol, stratumCol, k)
    val next = IndexDirs.nextDir(spark, reservoirPath(statePath))
    winners.coalesce(1).write.mode("overwrite").parquet(next)
    IndexDirs.retire(spark, reservoirPath(statePath))
  }

  /** The maintained sample — (stratum, key, weight, priority,
    * sample_rank), None before the first commit. */
  def current(spark: SparkSession, statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, reservoirPath(statePath))

  /** Attach to a streaming source: one [[processBatch]] per
    * micro-batch (foreachBatch — the same orchestration as every
    * maintained index; exactly-once NOT required, the fold absorbs
    * replays). */
  def attach(docs: DataFrame, keyCol: String, stratumCol: String,
             weightCol: String, k: Int, statePath: String,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.ProcessingTime(1000))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$statePath/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, keyCol, stratumCol, weightCol, k, statePath)
      }
      .start()

  private def ranked(rows: DataFrame, keyCol: String, stratumCol: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratumCol)
      .orderBy(col("priority"), col(keyCol))
    rows.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }
}
