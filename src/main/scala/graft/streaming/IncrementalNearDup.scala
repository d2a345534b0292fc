package graft.streaming

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
  *  2. probe the accumulated index with a PARTITION-PRUNED read: the
  *     index is stored hive-partitioned on `pb = hash(band, key) mod
  *     indexBuckets`, the delta's touched `pb` set is collected
  *     driver-side (Δ-sized, ≤ indexBuckets values), and the probe
  *     scans ONLY those directories — candidates are (band, key)
  *     equi-join matches of the delta against prunedIndex ∪ delta,
  *     with a Δ-scoped `maxBucket` skew cap (bucket sizes are counted
  *     only for keys the delta actually touches);
  *  3. verify candidates by exact jaccard on the stored shingle-hash
  *     sets (native merge walk — same verifier as the batch join);
  *  4. fold the verified edges into the labeling with
  *     [[ConnectedComponents.addEdges]] — the previous labeling is a
  *     star forest, so convergence takes 1–2 rounds REGARDLESS of how
  *     big the accumulated corpus is: label maintenance is Δ-sized;
  *  5. append the delta's band rows to the index, anti-joined against
  *     the pruned read first so a foreachBatch REPLAY (crash between
  *     append and checkpoint commit, or a partially committed append)
  *     re-appends nothing it already wrote — the index stays
  *     duplicate-free; then commit the labeling as a new version
  *     (readers only see versions whose `_SUCCESS` marker exists, so
  *     an in-flight or crashed write is invisible).
  *
  * Scale notes. The label fold and the verification are Δ-sized, and
  * the probe reads only the delta's touched buckets. The bucket count
  * is NOT a knob to re-tune as the corpus grows: `indexBuckets` is
  * only the initial layout, and the [[compact]] sweep SPLITS any
  * bucket whose data passes a size threshold ([[BucketTrie]] —
  * extendible hashing on the key hash's low bits, so a split rewrites
  * only that bucket's files), keeping per-bucket probe cost bounded
  * regardless of corpus growth. Each batch appends ONE file to the
  * version's L0 delta zone ([[IndexDirs.appendL0]] — never one file
  * per touched bucket, which scales with the bucket count); probes
  * read bucketed(pruned) ∪ L0(whole, bounded by the compaction
  * interval); the sweep merges L0 into the buckets, rewrites
  * fragmented buckets into one sorted run, and carries untouched
  * buckets forward by raw file copy — exactly an LSM layout. Streaming ≡
  * batch equivalence (same pair set,
  * same clusters as one-shot [[Dedup.nearDuplicates]] + connected
  * components) is spec-checked on the real documents table
  * (IncrementalNearDupSpec); pruning and probe-volume growth are
  * spec-checked in StreamingDedupScaleSpec.
  */
object IncrementalNearDup {

  /** Tuning knobs, fixed for the lifetime of one state directory (band
    * keys and the bucketing baked into the index depend on them).
    * `indexBuckets` is the INITIAL hive-partition count of the band
    * index (a power of two); [[compact]] grows it automatically by
    * splitting over-threshold buckets. */
  case class Params(shingleLen: Int = 1, numHashes: Int = 32,
                    numBands: Int = 4, threshold: Double = 0.7,
                    maxBucket: Int = 10000, indexBuckets: Int = 64)

  private def indexPath(statePath: String) = s"$statePath/index"

  /** The current labeling (node, component) — empty frame before the
    * first batch ([[LabelStore]] versioning: readers only see
    * `_SUCCESS`-complete versions). Singleton docs carry no row (as in
    * [[ConnectedComponents.connectedComponents]]); join with the doc
    * table and coalesce to the doc id for full-cluster output. */
  def labels(spark: SparkSession, statePath: String): DataFrame =
    LabelStore.labels(spark, statePath)

  /** Cluster id per doc (docs absent from every pair are their own
    * singleton cluster) — the incremental counterpart of
    * [[ConnectedComponents.dupClusters]]. */
  def clusters(docs: DataFrame, idCol: String, statePath: String): DataFrame =
    docs.select(col(idCol))
      .join(labels(docs.sparkSession, statePath),
        col(idCol) === col("node"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))

  /** Exploded band rows of a document batch with their index bucket:
    * (__id, __shh, band, key, pb) — the unit the index stores and the
    * probe joins on. `pb` is a pure function of (band, key) UNDER THE
    * CURRENT BUCKET TRIE (initially `hash mod indexBuckets`; buckets
    * split as the index grows — [[BucketTrie]]), so every index row
    * colliding with a delta key lives in a bucket the delta itself
    * touches. */
  private[graft] def bandRows(docs: DataFrame, idCol: String,
                              textCol: String, params: Params,
                              trie: BucketTrie.Trie): DataFrame =
    Dedup.bandSignatures(docs, idCol, textCol,
        params.shingleLen, params.numHashes, params.numBands)
      .withColumnRenamed(idCol, "__id")
      .select(col("__id"), col("__shh"),
        posexplode(col("__bk")).as(Seq("band", "key")))
      .withColumn("pb", trie.bucketCol(xxhash64(col("band"), col("key"))))

  /** [[bandRows]] under the state directory's live trie. */
  private[graft] def bandRows(docs: DataFrame, idCol: String,
                              textCol: String, params: Params,
                              statePath: String): DataFrame =
    bandRows(docs, idCol, textCol, params,
      BucketTrie.load(docs.sparkSession, indexPath(statePath),
        params.indexBuckets))

  /** The accumulated band index: bucketed store ∪ the L0 delta zone
    * (per-batch append files, bounded by the compaction interval) —
    * empty before the first batch. Reads the newest live version
    * ([[IndexDirs]]); a [[compact]] that crashed mid-write left an
    * unmarked directory this never sees. */
  private[graft] def bandIndex(spark: SparkSession,
                               statePath: String): Option[DataFrame] =
    IndexDirs.readWithL0(spark, indexPath(statePath))

  /** Partition-pruned view of the index: only the `pb` buckets in
    * `touched` are read (hive partition pruning — the scan's
    * PartitionFilters carry the IN, and non-matching directories are
    * never listed into the scan). */
  private[graft] def prunedIndex(index: DataFrame,
                                 touched: Seq[Int]): DataFrame =
    index.filter(col("pb").isin(touched: _*))

  /** Fold one batch of new documents (idCol, textCol) into the state.
    * Callable directly (batch-incremental) or via [[attach]]. */
  def processBatch(newDocs: DataFrame, idCol: String, textCol: String,
                   statePath: String, params: Params = Params()): Unit = {
    val spark = newDocs.sparkSession
    if (newDocs.isEmpty) return
    // one tiny driver-side sidecar read per batch: the live bucket
    // trie (appends and probes must agree with the stored layout)
    val trie = BucketTrie.load(spark, indexPath(statePath),
      params.indexBuckets)
    val deltaBands = bandRows(newDocs, idCol, textCol, params, trie).cache()
    // every frame persisted for this batch releases in the finally —
    // an exception anywhere between a persist and the batch tail
    // (probe collect, failed append, label commit) must not leak
    // blocks across the batch loop (the r13 soak-leak class)
    val batchCached =
      scala.collection.mutable.ArrayBuffer[DataFrame](deltaBands)
    try {

    // Δ-sized driver hop: the touched bucket ids (≤ indexBuckets ints)
    // drive the partition-pruned probe read below
    val touchedPb = deltaBands.select("pb").distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq

    // Key-level probe narrowing: every consumer of the pruned read
    // (the replay anti-join, the skew-cap sizes, candidate
    // generation) can only ever match index rows whose (band, key)
    // the delta touches — so the probe drops to the COLLIDING rows
    // right at the read via a broadcast semi-join on the Δ-sized key
    // set, and the surviving (collision-sized) frame persists across
    // its three consumers instead of the whole touched-bucket scan
    // re-running per consumer. At 64 initial buckets a 500-doc delta
    // touches every bucket, so without this the fold re-scanned the
    // entire accumulated store three times (measured: the r13 soak's
    // fold-wall growth with flat file counts).
    val touchedKeys = deltaBands.select("band", "key").distinct()
    val oldPruned: DataFrame = (bandIndex(spark, statePath) match {
      case Some(idx) => prunedIndex(idx, touchedPb)
        .select("__id", "__shh", "band", "key", "pb")
      case None => deltaBands.limit(0)
    }).join(broadcast(touchedKeys), Seq("band", "key"), "left_semi")
      .persist()
    batchCached += oldPruned

    // replay / partial-append idempotency: any delta row the index
    // already holds (same doc, same band key — signatures are pure
    // functions of the text) is dropped before the append. The check
    // runs against the PRUNED read only: a replayed row necessarily
    // lives in a bucket the delta touches.
    val newRows = deltaBands.join(
      oldPruned.select("band", "key", "__id"),
      Seq("band", "key", "__id"), "left_anti")

    // probe universe: every index row colliding with the delta plus
    // the genuinely-new delta rows — each physical row exactly once
    // even under replay
    val allBands = oldPruned.unionByName(
      newRows.select("__id", "__shh", "band", "key", "pb"))
    // Δ-scoped skew cap: bucket sizes only for (band, key) the delta
    // touches; an over-cap bucket is dropped whole. (The batch join
    // additionally emits a min-anchor star from over-cap buckets for
    // cluster connectivity; here the accumulated labeling already
    // holds the history, so the Δ probe only needs the delta's own
    // witnesses — the streaming ≡ batch spec runs under caps that
    // never trip, and a tripping cap is a deliberate recall trade in
    // both forms.)
    // (allBands is already Δ-key-scoped: oldPruned was semi-joined on
    // touchedKeys and newRows ARE delta rows — no re-join needed)
    val sizes = allBands
      .groupBy("band", "key").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= params.maxBucket)
      .select("band", "key")
    // candidates: delta × (prunedIndex ∪ delta) colliding on a
    // surviving (band, key); ids ordered, duplicates (several common
    // bands) collapsed BEFORE the verify so each pair is verified once
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

    // commit: labels first (new version dir, visible only once its
    // _SUCCESS lands — LabelStore readers skip incomplete dirs), then
    // the index append. A crash anywhere re-processes the batch
    // idempotently: the pair set and labels are functions of content,
    // addEdges is idempotent on repeated edges, and the anti-join
    // above keeps a replayed append from duplicating index rows.
    LabelStore.commit(spark, statePath, updated)
    if (!newRows.isEmpty)
      // ONE L0 file per batch regardless of bucket count (appends
      // extend a snapshot; they never invalidate a reader's held file
      // listing) — [[IndexDirs.appendL0]]; the sweep merges L0 into
      // the pb= bucket directories
      IndexDirs.appendL0(spark, indexPath(statePath), newRows)
    } finally { batchCached.foreach(_.unpersist(blocking = false)); () }
    ()
  }

  /** Default per-bucket split threshold: at ~256 MB a bucket probe is
    * one comfortable task; growth past it doubles that bucket. */
  val DefaultSplitBytes: Long = 256L << 20

  /** LSM-ish maintenance for the band index, now ADAPTIVE: buckets
    * whose data exceed `splitBytes` split one level (only THEIR files
    * are rewritten — [[BucketTrie]] locality), fragmented buckets are
    * rewritten into one sorted run, and untouched buckets carry
    * forward by raw file copy. Probe cost per touched key therefore
    * stays bounded by the split threshold as the corpus grows —
    * `indexBuckets` is only the STARTING layout, not a knob to
    * re-tune. Runs between batches (same single-writer discipline as
    * the fold); the sweep lands as the NEXT index version, visible
    * atomically once its `_SUCCESS` exists, with the previous version
    * retained one generation ([[IndexDirs.retire]]) — snapshot
    * isolation at the directory-version level. A crash mid-write
    * leaves an unmarked directory readers ignore. Labels are
    * untouched — only the physical layout (and the bucket trie)
    * changes. */
  def compact(spark: SparkSession, statePath: String,
              splitBytes: Long = DefaultSplitBytes,
              minBucketBytes: Long = BucketTrie.DefaultMinBucketBytes): Unit =
    BucketTrie.compactStore(spark, indexPath(statePath), "pb",
      xxhash64(col("band"), col("key")), Seq("band", "key"), splitBytes,
      minBucketBytes)

  /** Maintenance sweep for week-long streams: prune the label store
    * to its retention window (committed versions beyond the newest
    * `keep`, plus crashed uncommitted leftovers that would otherwise
    * linger forever — [[LabelStore.vacuum]]) and retire superseded
    * index generations ([[IndexDirs.retire]]). Same single-writer +
    * reader-grace contract as [[compact]]; run between batches. */
  def vacuum(spark: SparkSession, statePath: String, keep: Int = 2,
             readerGraceMs: Option[Long] = None): Unit = {
    LabelStore.vacuum(spark, statePath, keep)
    readerGraceMs match {
      case Some(g) =>
        IndexDirs.retireAged(spark, indexPath(statePath), graceMs = g)
      case None => IndexDirs.retire(spark, indexPath(statePath), keep = keep)
    }
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
