package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.similarity.Similarity

/** Incremental IVF-index maintenance — [[IncrementalAnnIndex]]'s
  * sibling for the inverted-file layout: new vectors fold into the
  * persisted per-list partitioning that [[Similarity.ivfTopK]] probes.
  *
  * The quantizer (coarse centroids) is trained ONCE — on the first
  * batch — and then FROZEN: list assignment is a pure scan-local
  * function of the vector, so appends are deterministic, replays are
  * idempotent, and a maintained index is row-identical to a one-shot
  * [[Similarity.withIvfLists]] build over the same corpus with the
  * same centroids (spec-pinned). That is standard IVF practice: the
  * quantizer is a sample-trained artifact, lists absorb growth, and
  * drift is handled by an explicit [[retrain]] — a rebuild from the
  * accumulated rows with freshly trained centroids (deterministic:
  * the decimal-mean Lloyd step), atomically swapped in. Probes prune
  * to the probed `ivf_list` directories exactly like the one-shot
  * index; per-batch work is Δ-sized (assign + anti-join + append).
  */
object IncrementalIvfIndex {

  /** `k` lists, fixed per state directory at first training;
    * `refineSteps` Lloyd passes for both the initial train and every
    * [[retrain]]. */
  case class Params(k: Int = 16, refineSteps: Int = 1)

  private def indexPath(statePath: String) = s"$statePath/index"

  /** The sidecar lives INSIDE each index VERSION directory
    * (underscore-prefixed, so Spark's file listing never mistakes it
    * for data), and a version is live only once the sidecar's own
    * `_SUCCESS` exists too ([[markers]]): quantizer and list
    * assignment become visible together — the two can never disagree,
    * whatever the crash point. */
  private def centroidsPath(indexDir: String) = s"$indexDir/_centroids"

  /** Sidecar gates a version's liveness alongside the root `_SUCCESS`. */
  private val markers = Seq("_centroids/_SUCCESS")

  /** The frozen quantizer — None before the first commit. Only a
    * sidecar inside a LIVE version is trusted: a quantizer stranded in
    * an unmarked `v0` by a crashed first append is ignored (and swept
    * by the writer's [[IndexDirs.prepareAppend]]) — the replayed first
    * batch retrains from its own data, so a stale artifact from a
    * changed source is never silently adopted. */
  def centroids(spark: SparkSession,
                statePath: String): Option[Array[(Int, Seq[Float])]] = {
    import spark.implicits._
    IndexDirs.currentDir(spark, indexPath(statePath), markers).map { dir =>
      spark.read.parquet(centroidsPath(dir))
        .as[(Int, Seq[Float])].collect().sortBy(_._1)
    }
  }

  /** The accumulated index — None before the first data append (a
    * version only goes live when the append's root `_SUCCESS` lands,
    * so the sidecar alone doesn't count). */
  def index(spark: SparkSession, statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, indexPath(statePath), markers)

  private def writeCentroids(spark: SparkSession, indexDir: String,
                             cents: Array[(Int, Seq[Float])]): Unit = {
    import spark.implicits._
    cents.toSeq.toDF("ivf_list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath(indexDir))
  }

  /** Fold one batch of new vectors into the index. The first batch
    * trains the quantizer; later batches assign against it frozen. */
  def processBatch(newVecs: DataFrame, idCol: String, vecCol: String,
                   statePath: String, params: Params = Params()): Unit = {
    val spark = newVecs.sparkSession
    if (newVecs.isEmpty) return
    // in-batch dedupe: the replay guard below anti-joins the PERSISTED
    // index only, so duplicate ids inside one micro-batch would all
    // append — collapse them here (deterministic: rows for one id are
    // identical under the frozen quantizer)
    val uniq = newVecs.dropDuplicates(idCol)
    val appendTo = IndexDirs.prepareAppend(spark, indexPath(statePath), markers)
    val cents = centroids(spark, statePath).getOrElse {
      val trained = Similarity.ivfCentroids(uniq, idCol, vecCol,
        params.k, params.refineSteps)
      // sidecar BEFORE the first data append: the version goes live
      // only when the append's root _SUCCESS lands after it
      writeCentroids(spark, appendTo, trained)
      trained
    }
    val delta = Similarity.withIvfLists(uniq, vecCol, cents).cache()
    try {
      // Δ-sized driver hop: the touched list ids bound the pruned
      // replay-guard read (a vector has ONE list, and a replayed row's
      // assignment is identical — frozen quantizer)
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

  /** Top-k against the maintained index: probed lists read
    * partition-pruned, exact-cosine re-rank — the shared
    * [[Similarity.ivfTopK]] over the maintained layout. */
  def ivfTopK(spark: SparkSession, statePath: String, idCol: String,
              vecCol: String, query: Seq[Float], k: Int,
              nProbe: Int = 3): DataFrame = {
    import spark.implicits._
    (index(spark, statePath), centroids(spark, statePath)) match {
      case (Some(idx), Some(cents)) =>
        Similarity.ivfTopK(idx, idCol, vecCol, query, k, cents, nProbe)
      case (Some(idx), None) =>
        // index without sidecar can't happen by construction, but if it
        // does, keep the id column's REAL type in the empty result
        idx.select(col(idCol)).limit(0).withColumn("cosine", lit(0.0))
      case _ =>
        // pre-first-batch: nothing stored to derive a schema from — the
        // empty frame uses the documented (long id, double cosine)
        // default shape; non-long id columns only gain their true type
        // once the first batch lands
        Seq.empty[(Long, Double)].toDF(idCol, "cosine")
    }
  }

  /** Quantizer-drift maintenance: retrain centroids on the ACCUMULATED
    * corpus (same deterministic decimal-mean Lloyd step as the initial
    * train), reassign every stored vector, and land the rewritten
    * index + sidecar as the NEXT version — live atomically when the
    * sidecar marker (written last) appears, so assignment and
    * quantizer become visible together; the previous version is
    * retained one generation for concurrent readers
    * ([[IndexDirs.retire]]). The heavyweight counterpart of
    * [[IncrementalAnnIndex.compact]] — run it when list skew says the
    * first-batch sample stopped representing the distribution. */
  def retrain(spark: SparkSession, statePath: String, idCol: String,
              vecCol: String, params: Params = Params()): Unit = {
    index(spark, statePath).foreach { idx =>
      val corpus = idx.drop("ivf_list").cache()
      try {
        val cents = Similarity.ivfCentroids(corpus, idCol, vecCol,
          params.k, params.refineSteps)
        val p = indexPath(statePath)
        val next = IndexDirs.nextDir(spark, p)
        Similarity.withIvfLists(corpus, vecCol, cents)
          .repartition(col("ivf_list"))
          .write.mode("overwrite").partitionBy("ivf_list").parquet(next)
        // sidecar LAST: its _SUCCESS is the liveness marker, so the
        // new version appears with assignment and quantizer together
        writeCentroids(spark, next, cents)
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
