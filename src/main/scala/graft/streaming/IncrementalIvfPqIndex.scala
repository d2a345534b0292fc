package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.similarity.Similarity

/** Incremental maintenance for the composed IVF-PQ index
  * ([[Similarity.ensureIvfPqIndex]]) — the [[IncrementalIvfIndex]]
  * discipline extended to BOTH quantizers: coarse centroids AND PQ
  * codebooks train once (first batch) and freeze, so list assignment
  * and code encoding are pure scan-local functions of the vector.
  * Appends are deterministic, replays idempotent (the guard anti-join
  * reads only the touched `ivf_list` partitions — Δ-scoped, like the
  * IVF sibling, unlike a flat PQ table whose guard would scan every
  * id), and the maintained index probes identically to a one-shot
  * build over the same corpus with the same frozen artifacts
  * (spec-pinned). Drift is an explicit [[retrain]]: both artifacts
  * retrain deterministically on the accumulated rows and land with
  * the reassigned index as ONE new [[IndexDirs]] version (sidecars
  * written last gate its liveness, so index, quantizer, and codebooks
  * become visible together, whatever the crash point).
  */
object IncrementalIvfPqIndex {

  /** Fixed per state directory at first training. */
  case class Params(kLists: Int = 16, m: Int = 8, ksub: Int = 16,
                    refineSteps: Int = 1)

  private def indexPath(statePath: String) = s"$statePath/index"
  private def centroidsPath(indexDir: String) = s"$indexDir/_centroids"
  private def codebooksPath(indexDir: String) = s"$indexDir/_codebooks"

  /** BOTH sidecars gate a version's liveness alongside the root
    * `_SUCCESS`: coarse quantizer, codebooks, and list assignment can
    * never be seen disagreeing. */
  private val markers = Seq("_centroids/_SUCCESS", "_codebooks/_SUCCESS")

  /** The frozen coarse quantizer — None before the first commit. Only
    * a sidecar inside a LIVE version is trusted: an artifact stranded
    * in an unmarked `v0` by a crashed first append is ignored (and
    * swept by the writer's [[IndexDirs.prepareAppend]]) — the replayed
    * first batch retrains from its own data. */
  def centroids(spark: SparkSession,
                statePath: String): Option[Array[(Int, Seq[Float])]] = {
    import spark.implicits._
    IndexDirs.currentDir(spark, indexPath(statePath), markers).map { dir =>
      spark.read.parquet(centroidsPath(dir))
        .as[(Int, Seq[Float])].collect().sortBy(_._1)
    }
  }

  /** The frozen PQ codebooks — None before the first commit; same
    * live-version-only trust as [[centroids]]. */
  def codebooks(spark: SparkSession,
                statePath: String): Option[Array[Array[(Int, Seq[Float])]]] = {
    import spark.implicits._
    IndexDirs.currentDir(spark, indexPath(statePath), markers).map { dir =>
      spark.read.parquet(codebooksPath(dir))
        .as[(Int, Int, Seq[Float])].collect()
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, rows) => rows.sortBy(_._2).map(r => (r._2, r._3)) }
        .map(_.toArray).toArray
    }
  }

  /** The accumulated index — None before the first data append (a
    * version only goes live when the append's root `_SUCCESS` lands,
    * so the sidecars alone don't count). */
  def index(spark: SparkSession, statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, indexPath(statePath), markers)

  private def writeArtifacts(spark: SparkSession, indexDir: String,
                             cents: Array[(Int, Seq[Float])],
                             books: Array[Array[(Int, Seq[Float])]]): Unit = {
    import spark.implicits._
    cents.toSeq.toDF("ivf_list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath(indexDir))
    books.zipWithIndex.flatMap { case (b, i) =>
      b.map { case (code, c) => (i, code, c) }
    }.toSeq.toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(codebooksPath(indexDir))
  }

  /** Fold one batch of new vectors into the index. The first batch
    * trains BOTH quantizers; later batches assign/encode frozen. */
  def processBatch(newVecs: DataFrame, idCol: String, vecCol: String,
                   statePath: String, params: Params = Params()): Unit = {
    val spark = newVecs.sparkSession
    if (newVecs.isEmpty) return
    // in-batch dedupe: the replay guard below anti-joins the PERSISTED
    // index only, so duplicate ids inside one micro-batch would all
    // append — collapse them here (deterministic under the frozen
    // quantizers)
    val uniq = newVecs.dropDuplicates(idCol)
    val appendTo = IndexDirs.prepareAppend(spark, indexPath(statePath), markers)
    val (cents, books) =
      (centroids(spark, statePath), codebooks(spark, statePath)) match {
        case (Some(c), Some(b)) => (c, b)
        case _ =>
          val c = Similarity.ivfCentroids(uniq, idCol, vecCol,
            params.kLists, params.refineSteps)
          val b = Similarity.pqCodebooks(uniq, idCol, vecCol,
            params.m, params.ksub, params.refineSteps)
          // sidecars BEFORE the first data append: the version goes
          // live only when the append's root _SUCCESS lands after them
          writeArtifacts(spark, appendTo, c, b)
          (c, b)
      }
    val delta = Similarity.withIvfLists(
      Similarity.withPqCodes(uniq, vecCol, books), vecCol, cents).cache()
    try {
      // Δ-sized driver hop: touched lists bound the pruned replay-guard
      // read (assignment is frozen, so a replayed row lands identically)
      val touched = delta.select("ivf_list").distinct()
        .collect().map(_.getInt(0)).sorted.toIndexedSeq
      val existing = index(spark, statePath) match {
        case Some(idx) => idx.filter(col("ivf_list").isin(touched: _*))
          .select(col(idCol))
        case None => delta.select(col(idCol)).limit(0)
      }
      val newRows = delta.join(existing, Seq(idCol), "left_anti")
      if (!newRows.isEmpty)
        newRows.repartition(col("ivf_list"))
          .write.mode("append").partitionBy("ivf_list")
          .parquet(appendTo)
    } finally { delta.unpersist(); () }
  }

  /** Top-k against the maintained index — the shared
    * [[Similarity.ivfPqTopK]] over the maintained layout: probed lists
    * partition-prune (rows), ADC scans codes only (bytes), exact
    * re-rank. */
  def ivfPqTopK(spark: SparkSession, statePath: String, idCol: String,
                vecCol: String, query: Seq[Float], k: Int,
                nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    (index(spark, statePath), centroids(spark, statePath),
     codebooks(spark, statePath)) match {
      case (Some(idx), Some(cents), Some(books)) =>
        Similarity.ivfPqTopK(idx, idCol, vecCol, query, k, cents, books,
          nProbe)
      case (Some(idx), _, _) =>
        // index without sidecars can't happen by construction, but if
        // it does, keep the id column's REAL type in the empty result
        idx.select(col(idCol)).limit(0).withColumn("cosine", lit(0.0))
      case _ =>
        // pre-first-batch: nothing stored to derive a schema from — the
        // empty frame uses the documented (long id, double cosine)
        // default shape; non-long id columns only gain their true type
        // once the first batch lands
        Seq.empty[(Long, Double)].toDF(idCol, "cosine")
    }
  }

  /** Drift maintenance: retrain BOTH artifacts on the accumulated
    * corpus (deterministic), reassign and re-encode every stored
    * vector, and land the rewritten index + sidecars as the NEXT
    * [[IndexDirs]] version — live atomically when the sidecar markers
    * (written last) appear; the previous version is retained one
    * generation for concurrent readers ([[IndexDirs.retire]]). */
  def retrain(spark: SparkSession, statePath: String, idCol: String,
              vecCol: String, params: Params = Params()): Unit = {
    index(spark, statePath).foreach { idx =>
      val corpus = idx.drop("ivf_list", "pq_code").cache()
      try {
        val cents = Similarity.ivfCentroids(corpus, idCol, vecCol,
          params.kLists, params.refineSteps)
        val books = Similarity.pqCodebooks(corpus, idCol, vecCol,
          params.m, params.ksub, params.refineSteps)
        val p = indexPath(statePath)
        val next = IndexDirs.nextDir(spark, p)
        Similarity.withIvfLists(
            Similarity.withPqCodes(corpus, vecCol, books), vecCol, cents)
          .repartition(col("ivf_list"))
          .write.mode("overwrite").partitionBy("ivf_list").parquet(next)
        // sidecars LAST: their _SUCCESS files are the liveness markers,
        // so the new version appears with index, quantizer, and
        // codebooks together
        writeArtifacts(spark, next, cents, books)
        IndexDirs.retire(spark, p, markers)
      } finally { corpus.unpersist(); () }
    }
  }

  /** Attach to a streaming vector source: one [[processBatch]] per
    * micro-batch. */
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
