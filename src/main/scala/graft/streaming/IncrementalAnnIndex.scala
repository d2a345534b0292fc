package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.similarity.Similarity

/** Incremental ANN-index maintenance — the similarity suite's dynamic
  * table, the embedding analogue of [[IncrementalNearDup]]: a stream
  * of new (id, vector) rows maintains the persisted multi-table LSH
  * index that [[Similarity.annTopKMulti]] probes, so freshly ingested
  * vectors are searchable from the next batch boundary on and a
  * top-k probe NEVER recomputes bucket assignments over the corpus.
  *
  * Layout. One row per (vector, hash table) under the combined
  * (table, bucket) key `tb` — identical key scheme to
  * [[Similarity.ensureLshIndexMulti]], so maintained and one-shot
  * indexes agree row-for-row. Rows land hive-partitioned on
  * `pb = tb div span` where `span` covers `tables·2^planes /
  * indexBuckets` consecutive keys: a directory prune on `pb` IS a
  * key-range prune, and within each batch's files rows are sorted on
  * `tb` so parquet footer min/max stats skip non-probed keys — the
  * same two-level pruning the batch index gets from its range
  * partitioning, kept stable under appends.
  *
  * Per batch: explode the delta to its `tables` tb-rows (row-local,
  * codegen'd bucket expression — no shuffle besides the write's
  * repartition on the partition column), anti-join on (id, tb)
  * against the PRUNED existing index so a foreachBatch replay after a
  * crash re-appends nothing, and append one file per touched `pb`.
  * Probe cost is independent of corpus size at a fixed bucket count
  * (a probe reads only its colliding directories); file counts grow
  * one file per touched dir per batch, so long streams periodically
  * [[compact]] — an LSM-ish rewrite that re-sorts each directory into
  * one run. Streaming ≡ batch (maintained probe == one-shot
  * [[Similarity.ensureLshIndexMulti]] probe on the same corpus) is
  * spec-checked on the real embeddings table (StreamingAnnSpec).
  */
object IncrementalAnnIndex {

  /** Fixed for the lifetime of one state directory (tb keys and the
    * pb layout baked into the index depend on them). Defaults match
    * the s02 catalog entry. `indexBuckets` is the directory-count
    * knob: scale it with the corpus so per-directory volume stays
    * constant. */
  case class Params(numPlanes: Int = 8, tables: Int = 8, seed: Long = 42L,
                    indexBuckets: Int = 32)

  /** Consecutive tb keys per directory. */
  private def span(p: Params): Long = {
    val total = p.tables.toLong << p.numPlanes
    math.max(1L, (total + p.indexBuckets - 1) / p.indexBuckets)
  }

  private def indexPath(statePath: String) = s"$statePath/index"

  /** The accumulated index — None before the first batch. Reads the
    * newest live version ([[IndexDirs]]); a [[compact]] that crashed
    * mid-write left an unmarked directory this never sees — content
    * is never lost, the compaction simply didn't happen. */
  def index(spark: SparkSession, statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, indexPath(statePath))

  /** The delta exploded to its per-table rows: input columns plus
    * (tb, pb). Bucket assignment is the codegen'd plane-projection
    * expression — scan-local, shared with every batch LSH surface. */
  private[graft] def tbRows(newVecs: DataFrame, vecCol: String,
                            p: Params): DataFrame =
    newVecs.withColumn("tb", explode(array(Seq.tabulate(p.tables)(t =>
        lit(t.toLong * (1L << p.numPlanes)) +
          Similarity.lshBucket(col(vecCol), p.numPlanes,
            Similarity.tableSeed(p.seed, t))): _*)))
      .withColumn("pb", floor(col("tb") / lit(span(p))).cast("int"))

  /** Fold one batch of new vectors into the index. Callable directly
    * (batch-incremental) or via [[attach]]. */
  def processBatch(newVecs: DataFrame, idCol: String, vecCol: String,
                   statePath: String, params: Params = Params()): Unit = {
    val spark = newVecs.sparkSession
    if (newVecs.isEmpty) return
    val delta = tbRows(newVecs, vecCol, params).cache()
    try {
      // Δ-sized driver hop: touched directory ids drive the pruned
      // replay-guard read (≤ indexBuckets ints)
      val touched = delta.select("pb").distinct()
        .collect().map(_.getInt(0)).sorted.toIndexedSeq
      val existing = index(spark, statePath) match {
        case Some(idx) => idx.filter(col("pb").isin(touched: _*))
          .select(col(idCol), col("tb"))
        case None => delta.select(col(idCol), col("tb")).limit(0)
      }
      // replay idempotency: a row the index already holds (same id,
      // same tb — assignment is a pure function of the vector) is
      // dropped before the append; a replayed row necessarily lives in
      // a directory the delta touches, so the pruned read suffices
      val newRows = delta.join(existing, Seq(idCol, "tb"), "left_anti")
      if (!newRows.isEmpty)
        // one file per touched directory per batch, rows sorted on tb
        // inside it so probe reads skip row groups from footer stats;
        // appended inside the current index version
        newRows.repartition(col("pb")).sortWithinPartitions("tb")
          .write.mode("append").partitionBy("pb")
          .parquet(IndexDirs.prepareAppend(spark, indexPath(statePath)))
    } finally { delta.unpersist(); () }
  }

  /** The driver-side probe key set (query bucket + single-bit flips,
    * per table) — what [[annTopK]] prunes the read to. */
  private[graft] def probeTbs(query: Seq[Float], params: Params): Seq[Long] =
    (0 until params.tables).flatMap { t =>
      Similarity.probeBuckets(query, params.numPlanes,
          Similarity.tableSeed(params.seed, t))
        .map(b => t.toLong * (1L << params.numPlanes) + b)
    }

  /** Top-k against the maintained index: probe buckets computed
    * driver-side (query bucket + single-bit flips per table, zero
    * pre-probe jobs), directory prune on `pb`, footer-stat skip on
    * `tb`, then the shared dedupe + exact-cosine re-rank. Results are
    * identical to [[Similarity.annTopKMulti]] over a one-shot index of
    * the same corpus. */
  def annTopK(spark: SparkSession, statePath: String, idCol: String,
              vecCol: String, query: Seq[Float], k: Int,
              params: Params = Params()): DataFrame = {
    import spark.implicits._
    index(spark, statePath) match {
      case Some(idx) =>
        val pbs = probeTbs(query, params)
          .map(_ / span(params)).distinct.map(_.toInt)
        Similarity.annTopKMulti(idx.filter(col("pb").isin(pbs: _*)),
          idCol, vecCol, query, k, params.numPlanes, params.tables,
          params.seed)
      case None => Seq.empty[(Long, Double)].toDF(idCol, "cosine")
    }
  }

  /** LSM-ish maintenance: rewrite the index as one sorted run per
    * directory (many per-batch appended files → one file each),
    * preserving content exactly. Runs in the maintenance process
    * between batches (same single-writer discipline as the batch
    * fold); the rewrite lands as the NEXT index version, visible
    * atomically once its `_SUCCESS` exists, and the previous version
    * is retained one generation so a concurrent reader holding the
    * old file listing still completes ([[IndexDirs.retire]]). */
  def compact(spark: SparkSession, statePath: String,
              params: Params = Params()): Unit = {
    index(spark, statePath).foreach { idx =>
      val p = indexPath(statePath)
      idx.repartition(col("pb")).sortWithinPartitions("tb")
        .write.mode("overwrite").partitionBy("pb")
        .parquet(IndexDirs.nextDir(spark, p))
      IndexDirs.retire(spark, p)
    }
  }

  /** Attach to a streaming vector source: one [[processBatch]] per
    * micro-batch (foreachBatch — the dynamic-table orchestration). */
  def attach(vecs: DataFrame, idCol: String, vecCol: String,
             statePath: String, params: Params = Params(),
             trigger: Trigger = Trigger.ProcessingTime(1000)): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$statePath/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, vecCol, statePath, params)
      }
      .start()
}
