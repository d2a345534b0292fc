package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{CdcApply, PartitionedReplicatedTable}
import graft.text.TextFunctions

/** A maintained INVERTED INDEX serving BM25 — search-index maintenance
  * as the streaming sibling of [[graft.text.Retrieval.bm25TopK]]:
  * document micro-batches fold into a persisted postings relation, and
  * query-time cost is bounded by the QUERY's terms, never the corpus.
  *
  *  - `postings/` — (term, doc_id, tf), hive-partitioned on `tb`, the
  *    [[BucketTrie]] bucket of xxhash64(term) (initially mod
  *    termBuckets; buckets split as the postings grow) —
  *    [[IndexDirs]]-versioned, append-only. A query reads ONLY its
  *    terms' buckets (partition-pruned at planning time); per-term
  *    document frequencies fall out of the same pruned rows (one row
  *    per (term, doc)).
  *  - `doclen/` — (doc_id, dl), hive-partitioned on
  *    `db = md5Bucket(doc_id, docParts)`: the per-doc length the BM25
  *    denominator needs, read pruned to the matching docs' buckets.
  *  - `scalars/` — per-db-bucket (n_docs, total_len) partials as a
  *    [[PartitionedReplicatedTable]] keyed by the bucket id (≤ docParts
  *    rows): N and avgdl at query time are the sum of a dim-sized
  *    table, not a corpus scan. The rows are RECOMPUTED from the
  *    doclen store's touched buckets after each append (a pruned,
  *    Δ-bucket-bounded scan), so any crash/replay interleaving
  *    converges to the store's truth instead of drifting the way a
  *    running += would.
  *
  * Replays are absorbed store by store: the postings append anti-joins
  * a probe of the batch terms' buckets, the doclen append anti-joins
  * its buckets, and the scalar rows are recomputed, not accumulated.
  * Single-writer per statePath. Scores from [[bm25TopK]] equal the
  * one-shot operator over every doc ingested so far, at every batch
  * boundary.
  */
object IncrementalBm25 {

  case class Params(termBuckets: Int = 64, docParts: Int = 16)

  private def postingsPath(statePath: String) = s"$statePath/postings"
  private def doclenPath(statePath: String) = s"$statePath/doclen"

  private def repr(p: Params): String =
    s"termBuckets=${p.termBuckets};docParts=${p.docParts}"

  private def checkParams(spark: SparkSession, statePath: String,
                          p: Params): Unit =
    IndexDirs.checkParams(spark, statePath, repr(p))

  private def scalarsTable(spark: SparkSession,
                           statePath: String): PartitionedReplicatedTable =
    new PartitionedReplicatedTable(spark, s"$statePath/scalars",
      Seq("db"), "sp")

  /** Term-bucket assignment under the postings store's live trie:
    * initially `xxhash64(term) mod termBuckets`, buckets splitting as
    * the postings grow ([[BucketTrie]]) so a query term's bucket read
    * stays bounded regardless of corpus size. */
  private def tbOf(c: org.apache.spark.sql.Column,
                   trie: BucketTrie.Trie) =
    trie.bucketCol(xxhash64(c))
  private def postingsTrie(spark: SparkSession, statePath: String,
                           p: Params): BucketTrie.Trie =
    BucketTrie.load(spark, postingsPath(statePath), p.termBuckets)
  private def dbOf(c: org.apache.spark.sql.Column, p: Params) =
    TextFunctions.md5Bucket(c, p.docParts).cast("int")

  /** The accumulated postings store (bucketed ∪ L0 delta) / doclen
    * store — None pre-first-commit. */
  def postings(spark: SparkSession, statePath: String): Option[DataFrame] =
    IndexDirs.readWithL0(spark, postingsPath(statePath))
  def docLengths(spark: SparkSession, statePath: String): Option[DataFrame] =
    IndexDirs.readIfExists(spark, doclenPath(statePath))

  /** Fold one document micro-batch. */
  def processBatch(docsBatch: DataFrame, idCol: String, textCol: String,
                   statePath: String, params: Params = Params()): Unit = {
    // In-batch dedup (the IncrementalDsir discipline): the anti-join
    // replay guards below only absorb CROSS-batch duplicates — a
    // micro-batch delivering the same doc twice would append duplicate
    // doclen rows and permanently inflate N, avgdl and df.
    val newDocs = docsBatch.dropDuplicates(idCol)
    val spark = newDocs.sparkSession
    if (newDocs.isEmpty) return
    checkParams(spark, statePath, params)

    val toks = TextFunctions.tokens(col(textCol))
    val lens = newDocs.select(col(idCol).as("doc_id"),
        size(toks).cast("long").as("dl"))
      .withColumn("db", dbOf(col("doc_id"), params))
      .localCheckpoint(true)
    val post = newDocs.select(col(idCol).as("doc_id"),
        explode(toks).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("tb", tbOf(col("term"),
        postingsTrie(spark, statePath, params)))
      .localCheckpoint(true)

    // Orphaned-state guard (the IncrementalDupSpans discipline): in
    // the pre-snapshot window — postings/doclen landed for some batch
    // but the scalar table never committed — the ONLY safe input is a
    // replay of that batch. Fresh docs instead would leave the orphan
    // docs permanently outside doclen/scalars (inflating every shared
    // term's df while never being scorable); fail loudly. The check
    // scans the stores, which at this point hold at most the one
    // interrupted batch.
    if (!scalarsTable(spark, statePath).isSnapshotDone) {
      val batchIds = lens.select("doc_id")
      def clean(store: Option[DataFrame]): Boolean = store.forall(
        _.select("doc_id").distinct()
          .join(batchIds, Seq("doc_id"), "left_anti").isEmpty)
      require(clean(postings(spark, statePath)) &&
          clean(docLengths(spark, statePath)),
        s"stores at $statePath hold docs with no committed scalars — " +
          "replay the interrupted batch before feeding new data")
    }

    // postings append, replay-idempotent: probe ONLY the batch terms'
    // buckets for rows of the batch's own docs
    val tbs = post.select("tb").distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    val postProbe = postings(spark, statePath) match {
      case Some(s) => s.filter(col("tb").isin(tbs: _*))
        .join(lens.select("doc_id"), "doc_id")
        .select("term", "doc_id")
      case None => post.select("term", "doc_id").limit(0)
    }
    val newPost = post.join(postProbe, Seq("term", "doc_id"), "left_anti")
    if (!newPost.isEmpty)
      // one L0 file per batch regardless of term-bucket count
      IndexDirs.appendL0(spark, postingsPath(statePath), newPost)

    // doclen append, same discipline on the doc buckets
    val dbs = lens.select("db").distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    val lenProbe = docLengths(spark, statePath) match {
      case Some(s) => s.filter(col("db").isin(dbs: _*))
        .select("doc_id").join(lens.select("doc_id"), "doc_id")
      case None => lens.select("doc_id").limit(0)
    }
    val newLens = lens.join(lenProbe, Seq("doc_id"), "left_anti")
    if (!newLens.isEmpty)
      newLens.write.mode("append").partitionBy("db")
        .parquet(IndexDirs.prepareAppend(spark, doclenPath(statePath)))

    // touched-bucket scalar rows RECOMPUTED from the store (pruned to
    // the batch's db buckets) — idempotent under any crash/replay
    val scalarRows = docLengths(spark, statePath).get
      .filter(col("db").isin(dbs: _*))
      .groupBy("db")
      .agg(count(lit(1)).cast("long").as("n_docs"),
           sum("dl").cast("long").as("total_len"))
      .withColumn("sp", col("db"))
      .localCheckpoint(true)
    val sc = scalarsTable(spark, statePath)
    if (!sc.isSnapshotDone) sc.snapshot(scalarRows)
    else sc.applyChanges(scalarRows
      .withColumn(CdcApply.OpCol, lit(CdcApply.Update))
      .withColumn(CdcApply.LsnCol, lit(System.nanoTime()))
      .withColumn(CdcApply.CommitTsCol, current_timestamp()))
  }

  /** BM25 top-k over the maintained index — query cost is bounded by
    * the query terms' postings (pruned buckets), the matching docs'
    * doclen buckets, and the ≤ docParts scalar rows; identical scores
    * (4 dp) to [[graft.text.Retrieval.bm25TopK]] over the ingested
    * corpus. None before the first commit. */
  def bm25TopK(spark: SparkSession, statePath: String, terms: Seq[String],
               k: Int, k1: Double = 1.2, b: Double = 0.75,
               params: Params = Params()): Option[DataFrame] = {
    // read-only check: a query must never create (and freeze) the
    // sidecar under a not-yet-ingested state dir
    IndexDirs.requireParams(spark, statePath, repr(params))
    val sc = scalarsTable(spark, statePath)
    if (!sc.isSnapshotDone) return None
    val scal = sc.current()
      .agg(sum("n_docs").cast("double").as("__n"),
           (sum("total_len").cast("double") /
             sum("n_docs").cast("double")).as("__avgdl"))
    // driver-side bucket computation must match tbOf exactly — a tiny
    // Spark-local eval instead of reimplementing xxhash64 on the JVM
    import spark.implicits._
    val termBuckets = terms.toDF("term")
      .withColumn("tb", tbOf(col("term"),
        postingsTrie(spark, statePath, params)))
      .collect().map(_.getInt(1)).distinct.toIndexedSeq
    val post = postings(spark, statePath) match {
      case Some(s) => s.filter(col("tb").isin(termBuckets: _*))
        .filter(col("term").isin(terms: _*))
      case None => return None
    }
    val dfreq = post.groupBy("term")
      .agg(count(lit(1)).cast("double").as("__df"))
    val matchDbs = post.select(dbOf(col("doc_id"), params).as("db"))
      .distinct().collect().map(_.getInt(0)).sorted.toIndexedSeq
    val lens = docLengths(spark, statePath).get
      .filter(col("db").isin(matchDbs: _*))
      .select(col("doc_id"), col("dl").cast("double").as("__dl"))
    Some(post
      .join(broadcast(dfreq), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(scal))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5)
          / (col("__df") + 0.5)))
      .withColumn("__s",
        col("__idf") * col("tf").cast("double") * (k1 + 1) /
          (col("tf").cast("double") +
            (col("__dl") / col("__avgdl") * b + (1 - b)) * k1))
      .groupBy("doc_id")
      .agg(round(sum("__s"), 4).as("bm25"),
           count(lit(1)).cast("long").as("n_matched_terms"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k))
  }

  /** Default per-bucket split threshold (see
    * [[IncrementalNearDup.DefaultSplitBytes]]). */
  val DefaultSplitBytes: Long = 256L << 20

  /** LSM-ish maintenance: one sorted run per postings/doclen bucket,
    * with the postings store ADAPTIVE ([[BucketTrie.compactStore]] —
    * over-threshold term buckets split one level, only their files
    * rewritten; untouched buckets carry forward by raw file copy).
    * The doclen store keeps its fixed `docParts` layout: its probe is
    * pruned to the MATCHED docs' buckets (query-sized), and the
    * scalar table is keyed by the same ids — both bounded without
    * splitting. */
  def compact(spark: SparkSession, statePath: String,
              splitBytes: Long = DefaultSplitBytes,
              minBucketBytes: Long = BucketTrie.DefaultMinBucketBytes): Unit = {
    BucketTrie.compactStore(spark, postingsPath(statePath), "tb",
      xxhash64(col("term")), Seq("term", "doc_id"), splitBytes,
      minBucketBytes)
    IndexDirs.readIfExists(spark, doclenPath(statePath)).foreach { s =>
      val p = doclenPath(statePath)
      s.repartition(col("db")).sortWithinPartitions("doc_id")
        .write.mode("overwrite").partitionBy("db")
        .parquet(IndexDirs.nextDir(spark, p))
      IndexDirs.retire(spark, p)
    }
  }

  /** Retention sweep: retire superseded store generations, vacuum the
    * scalar table. */
  def vacuum(spark: SparkSession, statePath: String, keep: Int = 2,
             readerGraceMs: Option[Long] = None): Unit = {
    readerGraceMs match {
      case Some(g) =>
        IndexDirs.retireAged(spark, postingsPath(statePath), graceMs = g)
        IndexDirs.retireAged(spark, doclenPath(statePath), graceMs = g)
      case None =>
        IndexDirs.retire(spark, postingsPath(statePath), keep = keep)
        IndexDirs.retire(spark, doclenPath(statePath), keep = keep)
    }
    val sc = scalarsTable(spark, statePath)
    if (sc.isSnapshotDone) sc.vacuum(keepManifests = keep)
  }

  /** Attach to a streaming document source. */
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
}
