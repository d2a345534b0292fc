package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental set-CONTAINMENT pair maintenance — the j03 join
  * ([[graft.dedup.Dedup.containmentJoin]]) as a dynamic table: a
  * stream of tokenized-document micro-batches maintains the exact
  * pair set at overlap coefficient ≥ τ, paying Δ-scoped work per
  * batch.
  *
  * Why it can be exact across batches: the asymmetric prefix filter's
  * theorem (a qualifying pair's smaller side shares one of its first
  * n − ⌈τ·n⌉ + 1 tokens with the partner) holds under ANY FIXED total
  * order of tokens — rare-first ranking is only a selectivity
  * heuristic. The batch join re-ranks per corpus; a maintained index
  * cannot (stored prefixes would go stale), so this maintainer
  * FREEZES the order at the first batch (the frozen-artifacts
  * contract of [[IncrementalIvfIndex]]): tokens ranked rare-first on
  * the first batch get codes in the upper half of the long range;
  * tokens first seen later get hash codes in the lower half — i.e.
  * BEFORE every trained token, which is the right heuristic, since a
  * token absent from the first batch is rare. The code is a pure
  * function of (frozen vocab, token), so every batch agrees on every
  * doc's prefix forever. Later-unseen tokens share the xxhash64 code
  * space (the d09 `hashGrams` collision-exactness contract).
  *
  * State, all [[IndexDirs]]-versioned under `statePath`:
  *  - `vocab`   — (token, code): the frozen first-batch ranking;
  *  - `docs`    — (__id, n, __w): coded sorted token arrays,
  *    hive-partitioned on `db = hash(id) mod docBuckets` so the
  *    verify step reads only candidate buckets;
  *  - `postings`— (r, __id, n, isp): one row per (doc, token), `isp`
  *    marking prefix membership, partitioned on `pb = r mod
  *    indexBuckets` — probes are PARTITION-PRUNED to the delta's
  *    token buckets;
  *  - `pairs`   — (a, b, containment): the maintained output,
  *    partitioned on `pp = hash(a, b) mod indexBuckets` for pruned
  *    replay anti-joins.
  *
  * Per batch: code the delta docs against the frozen vocab; probe the
  * pruned postings both ways (new-doc prefixes × old full postings
  * for pairs where the new doc is the smaller side, old PREFIX
  * postings × new full tokens for pairs where it is the larger);
  * dedupe candidates, fetch member arrays from the pruned doc store,
  * verify exact containment once per pair; commit pairs → docs →
  * postings (results before index, so a crash replay that finds its
  * postings already present — and therefore generates no candidates —
  * can only be one that already committed its pairs; any earlier
  * crash point replays the whole fold idempotently through the
  * per-store anti-join guards). Delta-derived frames are eagerly
  * localCheckpoint-ed before the first store write so no lazy plan
  * spans a store that a later write mutates.
  */
object IncrementalContainment {

  /** Knobs fixed for the lifetime of one state directory. */
  case class Params(threshold: Double = 0.9, minSize: Int = 1,
                    indexBuckets: Int = 64, docBuckets: Int = 64)

  private def vocabPath(s: String) = s"$s/vocab"
  private def docsPath(s: String) = s"$s/docs"
  private def postingsPath(s: String) = s"$s/postings"
  private def pairsPath(s: String) = s"$s/pairs"

  /** Trained codes occupy [2^62, 2^62 + |vocab|); unseen-token hash
    * codes occupy [0, 2^62) — strictly before every trained token. */
  private val TrainedBase = 1L << 62

  private def plen(n: org.apache.spark.sql.Column, threshold: Double) =
    (n - ceil(lit(threshold) * n) + 1).cast("int")

  /** The maintained pair set — empty before the first commit. */
  def pairs(spark: SparkSession, statePath: String): DataFrame =
    IndexDirs.readIfExists(spark, pairsPath(statePath))
      .map(_.select("a", "b", "containment"))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(Long, Long, Double)].toDF("a", "b", "containment")
      }

  /** Rare-first ranking of the first batch's tokens, packed like
    * [[graft.dedup.Dedup]]'s rankedSets (range-partitioned — no
    * single-task global sort), then lifted into the trained half of
    * the code space. */
  private def trainVocab(docs: DataFrame, tokensCol: String): DataFrame = {
    val ex = docs.select(explode(col(tokensCol)).as("token"))
    ex.groupBy("token").agg(count(lit(1)).as("__f"))
      .repartitionByRange(col("__f"), col("token"))
      .withColumn("__pid", spark_partition_id())
      .select(col("token"),
        (lit(TrainedBase) + shiftleft(col("__pid").cast("long"), 40) +
          row_number().over(Window.partitionBy(col("__pid"))
            .orderBy(col("__f"), col("token"))).cast("long")).as("code"))
  }

  /** Coded doc frame: (__id, n, __w sorted code array, db). */
  private def codeDocs(docs: DataFrame, idCol: String, tokensCol: String,
                       vocab: DataFrame, params: Params): DataFrame =
    docs.select(col(idCol).as("__id"), explode(col(tokensCol)).as("token"))
      .join(vocab, Seq("token"), "left")
      .withColumn("__r", coalesce(col("code"),
        pmod(xxhash64(col("token")), lit(TrainedBase))))
      .groupBy("__id")
      .agg(sort_array(collect_set(col("__r"))).as("__w"))
      .withColumn("n", size(col("__w")))
      .filter(col("n") >= params.minSize)
      .withColumn("db",
        pmod(xxhash64(col("__id")), lit(params.docBuckets)).cast("int"))

  private def postingRows(coded: DataFrame, params: Params): DataFrame =
    coded.select(col("__id"), col("n"),
        posexplode(col("__w")).as(Seq("__pos", "r")))
      .withColumn("isp", col("__pos") < plen(col("n"), params.threshold))
      .withColumn("pb",
        pmod(col("r"), lit(params.indexBuckets)).cast("int"))
      .select("r", "__id", "n", "isp", "pb")

  /** Fold one batch of tokenized documents (idCol, tokensCol with
    * distinct-element arrays) into the state. Single-writer per
    * statePath. */
  def processBatch(newDocs: DataFrame, idCol: String, tokensCol: String,
                   statePath: String, params: Params = Params()): Unit = {
    val spark = newDocs.sparkSession
    if (newDocs.isEmpty) return

    // frozen ranking: train on the first batch, read thereafter
    val vocab = IndexDirs.readIfExists(spark, vocabPath(statePath))
      .getOrElse {
        val v = trainVocab(newDocs, tokensCol)
        v.write.parquet(IndexDirs.nextDir(spark, vocabPath(statePath)))
        IndexDirs.readIfExists(spark, vocabPath(statePath)).get
      }

    val delta = codeDocs(newDocs, idCol, tokensCol, vocab, params)
      .localCheckpoint(true)
    val deltaPost = postingRows(delta, params).localCheckpoint(true)

    // Δ-sized driver hop: the postings buckets the delta touches
    val touchedPb = deltaPost.select("pb").distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    val oldPost = IndexDirs.readIfExists(spark, postingsPath(statePath))
      .map(_.filter(col("pb").isin(touchedPb: _*))
        .select("r", "__id", "n", "isp", "pb"))
      .getOrElse(deltaPost.limit(0))

    // replay / partial-append idempotency: a delta row the postings
    // already hold is dropped — and an all-dropped delta generates no
    // candidates, which is exactly right, because pairs commit first
    val newPost = deltaPost.join(oldPost.select("r", "__id"),
        Seq("r", "__id"), "left_anti")
      .localCheckpoint(true)

    val allFull = oldPost.unionByName(newPost)
    def side(df: DataFrame, tag: String) =
      df.select(col("r"), col("__id").as(s"${tag}_id"),
        col("n").as(s"${tag}_n"), col("isp").as(s"${tag}_isp"))
    // x = probe (prefix rows, valid when x is the smaller side);
    // candA: new-doc prefixes × everything; candB: old prefixes × new
    val candA = side(newPost.filter(col("isp")), "x")
      .join(side(allFull, "y"), "r")
    val candB = side(oldPost.filter(col("isp")), "x")
      .join(side(newPost, "y"), "r")
    val cand = candA.unionByName(candB)
      .filter(col("x_id") =!= col("y_id"))
      .filter(col("x_n") < col("y_n") ||
        (col("x_n") === col("y_n") && col("x_id") < col("y_id")))
      .select(least(col("x_id"), col("y_id")).as("a"),
              greatest(col("x_id"), col("y_id")).as("b"),
              least(col("x_n"), col("y_n")).as("n_min"))
      .dropDuplicates("a", "b")
      .localCheckpoint(true)

    // verify once per candidate: fetch member arrays from the delta ∪
    // the candidate-bucket-pruned doc store
    val candIds = cand.select(col("a").as("__id"))
      .unionByName(cand.select(col("b").as("__id"))).distinct()
    val touchedDb = candIds
      .select(pmod(xxhash64(col("__id")), lit(params.docBuckets))
        .cast("int").as("db"))
      .distinct().collect().map(_.getInt(0)).sorted.toIndexedSeq
    val oldDocs = IndexDirs.readIfExists(spark, docsPath(statePath))
      .map(_.filter(col("db").isin(touchedDb: _*))
        .select("__id", "n", "__w", "db"))
      .getOrElse(delta.limit(0))
    val members = delta.select("__id", "__w")
      .unionByName(oldDocs.select("__id", "__w"))
      // a replayed delta overlaps the stored docs; either copy works
      .dropDuplicates("__id")
    val verified = cand
      .join(members.select(col("__id").as("a"), col("__w").as("__wa")), "a")
      .join(members.select(col("__id").as("b"), col("__w").as("__wb")), "b")
      .withColumn("__si", graft.functions.arrays.sorted_intersect_size(
        col("__wa"), col("__wb")))
      .withColumn("containment",
        col("__si").cast("double") / col("n_min"))
      .filter(col("containment") >= params.threshold)
      .select(col("a"), col("b"), round(col("containment"), 4)
        .as("containment"))
      .withColumn("pp", pmod(xxhash64(col("a"), col("b")),
        lit(params.indexBuckets)).cast("int"))

    val oldPairs = IndexDirs.readIfExists(spark, pairsPath(statePath))
    val touchedPp = verified.select("pp").distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    val newPairs = (oldPairs match {
      case Some(p) => verified.join(
        p.filter(col("pp").isin(touchedPp: _*)).select("a", "b"),
        Seq("a", "b"), "left_anti")
      case None => verified
    }).localCheckpoint(true)

    // docs-store replay guard: prune by the DELTA's own db buckets —
    // oldDocs above is candidate-pruned, and a replayed batch whose
    // postings anti-join emptied the candidates would see an EMPTY
    // oldDocs there and re-append the whole delta
    val deltaDb = delta.select("db").distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    val guardDocs = IndexDirs.readIfExists(spark, docsPath(statePath))
      .map(_.filter(col("db").isin(deltaDb: _*)).select("__id"))
      .getOrElse(delta.limit(0).select("__id"))

    // commit order: results first, index state last (see scaladoc)
    if (!newPairs.isEmpty)
      newPairs.repartition(col("pp"))
        .write.mode("append").partitionBy("pp")
        .parquet(IndexDirs.prepareAppend(spark, pairsPath(statePath)))
    val newDocRows = delta.join(guardDocs, Seq("__id"), "left_anti")
    if (!newDocRows.isEmpty)
      newDocRows.repartition(col("db"))
        .write.mode("append").partitionBy("db")
        .parquet(IndexDirs.prepareAppend(spark, docsPath(statePath)))
    if (!newPost.isEmpty)
      newPost.repartition(col("pb"))
        .write.mode("append").partitionBy("pb")
        .parquet(IndexDirs.prepareAppend(spark, postingsPath(statePath)))
    ()
  }

  /** LSM-ish maintenance: rewrite each store's accumulated per-batch
    * files into one sorted run per bucket, content-identical, visible
    * atomically; previous generation retained for in-flight readers
    * ([[IndexDirs]] discipline, as in [[IncrementalNearDup.compact]]). */
  def compact(spark: SparkSession, statePath: String): Unit = {
    IndexDirs.readIfExists(spark, postingsPath(statePath)).foreach { p =>
      p.repartition(col("pb")).sortWithinPartitions("r", "__id")
        .write.mode("overwrite").partitionBy("pb")
        .parquet(IndexDirs.nextDir(spark, postingsPath(statePath)))
      IndexDirs.retire(spark, postingsPath(statePath))
    }
    IndexDirs.readIfExists(spark, docsPath(statePath)).foreach { d =>
      d.repartition(col("db")).sortWithinPartitions("__id")
        .write.mode("overwrite").partitionBy("db")
        .parquet(IndexDirs.nextDir(spark, docsPath(statePath)))
      IndexDirs.retire(spark, docsPath(statePath))
    }
    IndexDirs.readIfExists(spark, pairsPath(statePath)).foreach { p =>
      p.repartition(col("pp")).sortWithinPartitions("a", "b")
        .write.mode("overwrite").partitionBy("pp")
        .parquet(IndexDirs.nextDir(spark, pairsPath(statePath)))
      IndexDirs.retire(spark, pairsPath(statePath))
    }
  }

  /** Retention sweep for long streams: retire superseded store
    * generations (vocab included — retrains swap it). */
  def vacuum(spark: SparkSession, statePath: String, keep: Int = 2): Unit =
    Seq(vocabPath _, docsPath _, postingsPath _, pairsPath _)
      .foreach(p => IndexDirs.retire(spark, p(statePath), keep = keep))

  /** Re-freeze the ranking on the ACCUMULATED corpus and rebuild the
    * coded stores — the [[IncrementalIvfIndex.retrain]] answer to
    * first-batch vocabulary drift. Purely physical: the emitted pair
    * set is order-independent (the prefix theorem holds for any fixed
    * order), so `pairs` is untouched; only future probe SELECTIVITY
    * improves. Requires the original token source for the accumulated
    * docs — pass the same (idCol, tokensCol) frame shape processBatch
    * consumes, covering every doc folded so far. */
  def retrain(allDocs: DataFrame, idCol: String, tokensCol: String,
              statePath: String, params: Params = Params()): Unit = {
    val spark = allDocs.sparkSession
    val vocab = trainVocab(allDocs, tokensCol)
    vocab.write.parquet(IndexDirs.nextDir(spark, vocabPath(statePath)))
    IndexDirs.retire(spark, vocabPath(statePath))
    val frozen = IndexDirs.readIfExists(spark, vocabPath(statePath)).get
    val coded = codeDocs(allDocs, idCol, tokensCol, frozen, params)
    coded.repartition(col("db")).sortWithinPartitions("__id")
      .write.mode("overwrite").partitionBy("db")
      .parquet(IndexDirs.nextDir(spark, docsPath(statePath)))
    IndexDirs.retire(spark, docsPath(statePath))
    val reread = IndexDirs.readIfExists(spark, docsPath(statePath)).get
    postingRows(reread.select("__id", "n", "__w"), params)
      .repartition(col("pb")).sortWithinPartitions("r", "__id")
      .write.mode("overwrite").partitionBy("pb")
      .parquet(IndexDirs.nextDir(spark, postingsPath(statePath)))
    IndexDirs.retire(spark, postingsPath(statePath))
  }

  /** Attach to a streaming tokenized-document source: one
    * [[processBatch]] per micro-batch (foreachBatch — replays are
    * anti-joined away, so exactly-once delivery is not required). */
  def attach(docs: DataFrame, idCol: String, tokensCol: String,
             statePath: String, params: Params = Params(),
             trigger: Trigger = Trigger.ProcessingTime(1000)): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$statePath/checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, tokensCol, statePath, params)
      }
      .start()
}
