package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.{ConnectedComponents, Dedup}

/** Incremental NEAR-duplicate maintenance — the dedup suite's dynamic
  * table: a stream of document micro-batches maintains (a) a persisted
  * minhash band index and (b) a duplicate-cluster labeling, the way
  * the reference's `REFRESH_MODE = INCREMENTAL` maintains its
  * materialized view (`0_start_here.ipynb` dynamic-table cell) — new
  * data folds into standing state; nothing is ever recomputed from
  * scratch.
  *
  * Per batch:
  *  1. signature the new docs (shared [[Dedup.bandSignatures]] stage —
  *     band keys are a pure function of the text, so cross-batch
  *     collisions are identical to single-batch ones);
  *  2. probe the accumulated index: candidates are (band, key)
  *     equi-join matches of the delta against index ∪ delta, with a
  *     Δ-scoped `maxBucket` skew cap (bucket sizes are counted only
  *     for keys the delta actually touches);
  *  3. verify candidates by exact jaccard on the stored shingle-hash
  *     sets (native merge walk — same verifier as the batch join);
  *  4. fold the verified edges into the labeling with
  *     [[ConnectedComponents.addEdges]] — the previous labeling is a
  *     star forest, so convergence takes 1–2 rounds REGARDLESS of how
  *     big the accumulated corpus is: label maintenance is Δ-sized;
  *  5. append the delta to the index; commit the labeling as a new
  *     version (reads always see a complete labeling — the version
  *     dir is swapped only after a successful write).
  *
  * Scale notes. The label fold and the verification are Δ-sized; the
  * candidate probe is an equi-join whose INDEX side is a scan here —
  * at corpus scale the index wants storage bucketing on the band key
  * (bucketed table / Z-order) so the probe reads only colliding
  * buckets. Streaming ≡ batch equivalence (same pair set, same
  * clusters as one-shot [[Dedup.nearDuplicates]] + connected
  * components) is spec-checked on the real documents table.
  */
object IncrementalNearDup {

  /** Tuning knobs, fixed for the lifetime of one state directory (band
    * keys baked into the index depend on them). */
  case class Params(shingleLen: Int = 1, numHashes: Int = 32,
                    numBands: Int = 4, threshold: Double = 0.7,
                    maxBucket: Int = 10000)

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def indexPath(statePath: String) = s"$statePath/index"

  private def labelVersions(spark: SparkSession, statePath: String): Seq[Long] = {
    val dir = new Path(s"$statePath/labels")
    val f = fs(spark, statePath)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toLong).sorted
  }

  /** The current labeling (node, component) — empty frame before the
    * first batch. Singleton docs carry no row (as in
    * [[ConnectedComponents.connectedComponents]]); join with the doc
    * table and coalesce to the doc id for full-cluster output. */
  def labels(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    labelVersions(spark, statePath).lastOption match {
      case Some(v) => spark.read.parquet(s"$statePath/labels/v$v")
      case None => Seq.empty[(Long, Long)].toDF("node", "component")
    }
  }

  /** Cluster id per doc (docs absent from every pair are their own
    * singleton cluster) — the incremental counterpart of
    * [[ConnectedComponents.dupClusters]]. */
  def clusters(docs: DataFrame, idCol: String, statePath: String): DataFrame =
    docs.select(col(idCol))
      .join(labels(docs.sparkSession, statePath),
        col(idCol) === col("node"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))

  /** Fold one batch of new documents (idCol, textCol) into the state.
    * Callable directly (batch-incremental) or via [[attach]]. */
  def processBatch(newDocs: DataFrame, idCol: String, textCol: String,
                   statePath: String, params: Params = Params()): Unit = {
    val spark = newDocs.sparkSession
    if (newDocs.isEmpty) return
    val delta = Dedup.bandSignatures(newDocs, idCol, textCol,
      params.shingleLen, params.numHashes, params.numBands)
      .withColumnRenamed(idCol, "__id")
      .cache()

    val idxP = indexPath(statePath)
    val old: DataFrame =
      if (fs(spark, statePath).exists(new Path(idxP))) spark.read.parquet(idxP)
      else delta.limit(0)

    def bands(df: DataFrame) = df.select(col("__id"), col("__shh"),
      posexplode(col("__bk")).as(Seq("band", "key")))

    val deltaBands = bands(delta)
    val allBands = bands(old).unionByName(deltaBands)
    // Δ-scoped skew cap: bucket sizes only for (band, key) the delta
    // touches; an over-cap bucket is dropped whole (same contract as
    // the batch join's maxBucket)
    val touched = deltaBands.select("band", "key").distinct()
    val sizes = allBands.join(touched, Seq("band", "key"))
      .groupBy("band", "key").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= params.maxBucket)
      .select("band", "key")
    // candidates: delta × (index ∪ delta) colliding on a surviving
    // (band, key); ids ordered, duplicates (several common bands)
    // collapsed BEFORE the verify so each pair is verified once
    val cand = deltaBands.join(sizes, Seq("band", "key"))
      .select(col("band"), col("key"),
        col("__id").as("__da"), col("__shh").as("__sa"))
      .join(allBands.join(sizes, Seq("band", "key"))
        .select(col("band"), col("key"),
          col("__id").as("__db"), col("__shh").as("__sb")),
        Seq("band", "key"))
      .filter(col("__da") =!= col("__db"))
      .select(least(col("__da"), col("__db")).as("a"),
        greatest(col("__da"), col("__db")).as("b"),
        when(col("__da") < col("__db"), col("__sa")).otherwise(col("__sb")).as("__sx"),
        when(col("__da") < col("__db"), col("__sb")).otherwise(col("__sa")).as("__sy"))
      .dropDuplicates("a", "b")
    val nx = size(col("__sx")); val ny = size(col("__sy"))
    val edges = cand
      .filter(ny >= lit(params.threshold) * nx && nx >= lit(params.threshold) * ny)
      .withColumn("__si", graft.functions.arrays.sorted_intersect_size(
        col("__sx"), col("__sy")))
      .filter(col("__si").cast("double") / (nx + ny - col("__si")) >=
        params.threshold)
      .select("a", "b")

    // Δ-sized label fold (the star forest keeps old components
    // two-level; convergence is independent of corpus size)
    val updated = ConnectedComponents.addEdges(
      labels(spark, statePath), edges, "a", "b")

    // commit: labels first (new version dir — readers swap atomically
    // on the listing), then the index append; a crash between the two
    // re-processes the batch idempotently (pair set and labels are
    // functions of content, addEdges is idempotent on repeated edges)
    val versions = labelVersions(spark, statePath)
    val next = versions.lastOption.getOrElse(-1L) + 1
    updated.write.mode("overwrite").parquet(s"$statePath/labels/v$next")
    versions.dropRight(1).foreach(v =>
      fs(spark, statePath).delete(new Path(s"$statePath/labels/v$v"), true))
    delta.write.mode("append").parquet(idxP)
    delta.unpersist()
    ()
  }

  /** Attach to a streaming document source: one [[processBatch]] per
    * micro-batch (foreachBatch — the same orchestration the dynamic
    * table uses for its incremental refresh). */
  def attach(docs: DataFrame, idCol: String, textCol: String,
             statePath: String, params: Params = Params(),
             trigger: Trigger = Trigger.ProcessingTime(1000)): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$statePath/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, textCol, statePath, params)
      }
      .start()
}
