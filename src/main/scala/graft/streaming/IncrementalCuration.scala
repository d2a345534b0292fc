package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, Dedup}
import graft.text.{Mixture, TextFunctions}

/** The WHOLE curation pipeline under the dynamic-table discipline:
  * c01's stages — scan-local scoring (token count, quality, language),
  * near-dup cluster representative keep-set, admission filters — but
  * with the clustering MAINTAINED incrementally by
  * [[IncrementalNearDup]] instead of recomputed per refresh.
  *
  * Division of labor mirrors the reference's dynamic table over a
  * replicated base table (`0_start_here.ipynb` dynamic-table cell):
  * the stream folds new documents into standing dedup state (Δ-sized
  * work per batch), and the curated VIEW over the accumulated corpus
  * is one scan-local projection + one broadcast-able keep-list join —
  * the marginal cost of curation beyond dedup stays one projection,
  * exactly as in the batch pipeline (c01). Streaming ≡ batch is
  * spec-checked across multi-batch arrivals on the real documents
  * table (StreamingCurationSpec).
  */
object IncrementalCuration {

  /** Scan-local scoring stage shared by the batch and incremental
    * forms — pure projections, no shuffle. */
  def scored(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
      TextFunctions.qualityScore(col(textCol)).as("quality_score"),
      TextFunctions.langId(col(textCol)).as("lang_pred"))

  /** The training-data admission filters (same thresholds as c01). */
  private def admitted(df: DataFrame): DataFrame =
    df.filter(col("quality_score") >= 0.72 &&
      col("lang_pred") =!= "und" && col("n_tokens") >= 3)

  /** Curated view over the documents seen so far, reading the
    * duplicate clustering MAINTAINED at `statePath`: one projection
    * over the doc table plus a keep-list join against the (Δ-folded)
    * labeling — nothing here recomputes pairwise work. */
  def curated(docs: DataFrame, idCol: String, textCol: String,
              statePath: String): DataFrame = {
    val clusters = IncrementalNearDup.clusters(docs, idCol, statePath)
    val keepers = clusters
      .filter(col(idCol) === col("cluster_id")).select(col(idCol))
    admitted(scored(docs, idCol, textCol).join(keepers, idCol))
      .orderBy(idCol)
  }

  /** One-shot batch reference: the same pipeline with the clustering
    * recomputed from scratch ([[Dedup.nearDuplicates]] + connected
    * components) — the equivalence target for the incremental form. */
  def curatedBatch(docs: DataFrame, idCol: String, textCol: String,
                   params: IncrementalNearDup.Params =
                     IncrementalNearDup.Params()): DataFrame = {
    val pairs = Dedup.nearDuplicates(docs, idCol, textCol,
      params.shingleLen, params.numHashes, params.numBands,
      params.threshold, params.maxBucket)
    val clusters = ConnectedComponents.dupClusters(
      docs, idCol, pairs.select("a", "b"), "a", "b")
    val keepers = clusters
      .filter(col(idCol) === col("cluster_id")).select(col(idCol))
    admitted(scored(docs, idCol, textCol).join(keepers, idCol))
      .orderBy(idCol)
  }

  /** c03's streaming form: [[curated]] with the SECOND dedup axis —
    * docs must also be the representative of their EMBEDDING cluster,
    * maintained by [[IncrementalEmbeddingDedup]] at `semStatePath`
    * (lexical clusters catch copies, embedding clusters catch
    * paraphrases). Marginal cost over [[curated]]: one more
    * broadcast-able keep-list join against the maintained labeling. */
  def curatedSemantic(docs: DataFrame, idCol: String, textCol: String,
                      statePath: String, semStatePath: String): DataFrame = {
    val keepers = IncrementalNearDup.clusters(docs, idCol, statePath)
      .filter(col(idCol) === col("cluster_id")).select(col(idCol))
    val semKeepers = IncrementalEmbeddingDedup.clusters(
        docs.select(col(idCol)), idCol, semStatePath)
      .filter(col(idCol) === col("cluster_id")).select(col(idCol))
    admitted(scored(docs, idCol, textCol)
        .join(keepers, idCol).join(semKeepers, idCol))
      .orderBy(idCol)
  }

  /** [[curated]] with DECONTAMINATION composed in (c02's filter under
    * the dynamic-table discipline): docs whose n-gram overlap with the
    * benchmark exceeds `maxHits` are dropped. The benchmark is static
    * reference state, so its gram set + bloom build ONCE
    * ([[Dedup.benchmarkIndex]]) and every refresh pays one scan-local
    * bloom probe over the accumulated docs plus an exact verify join
    * pruned to the survivors — contamination is a per-doc property
    * (no cross-doc state), so the view needs no extra maintained
    * state beyond the dedup labeling. */
  def curatedClean(docs: DataFrame, idCol: String, textCol: String,
                   statePath: String, bench: Dedup.BenchmarkIndex,
                   gramLen: Int, maxHits: Long = 0): DataFrame = {
    val contaminated = Dedup
      .contaminationCountsWith(docs, bench, idCol, textCol, gramLen)
      .filter(col("n_contaminated_grams") > maxHits).select(col(idCol))
    curated(docs, idCol, textCol, statePath)
      .join(contaminated, Seq(idCol), "left_anti")
      .orderBy(idCol)
  }

  /** One-shot batch reference for [[curatedClean]]: batch clustering +
    * the exact (join-based) contamination filter. */
  def curatedCleanBatch(docs: DataFrame, idCol: String, textCol: String,
                        benchmark: DataFrame, gramLen: Int,
                        maxHits: Long = 0,
                        params: IncrementalNearDup.Params =
                          IncrementalNearDup.Params()): DataFrame = {
    val contaminated = Dedup
      .contaminationCounts(docs, benchmark, idCol, textCol, gramLen)
      .filter(col("n_contaminated_grams") > maxHits).select(col(idCol))
    curatedBatch(docs, idCol, textCol, params)
      .join(contaminated, Seq(idCol), "left_anti")
      .orderBy(idCol)
  }

  /** Scoring with the source column carried through (the mixture
    * stage groups by source). */
  private def scoredWithSource(docs: DataFrame, idCol: String,
                               sourceCol: String,
                               textCol: String): DataFrame =
    docs.select(col(idCol), col(sourceCol),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
      TextFunctions.qualityScore(col(textCol)).as("quality_score"),
      TextFunctions.langId(col(textCol)).as("lang_pred"))

  /** The mix-and-pack tail shared by the maintained and batch export
    * forms: train-split filter → token-budget mixture on survivor
    * volumes → fixed-length sequence packing (the c06 formula). */
  private def mixAndPack(surv: DataFrame, idCol: String, sourceCol: String,
                         budgets: DataFrame, seqTokens: Long): DataFrame = {
    val train = surv
      .withColumn("split", TextFunctions.hashSplit(col(idCol)))
      .filter(col("split") === "train")
      .select(col(idCol), col(sourceCol), col("n_tokens").cast("long").as("tok"))
    val mixed = Mixture.tokenBudgetMixtureCounts(
      train, idCol, sourceCol, "tok", budgets)
    val w = Window.partitionBy(sourceCol).orderBy(idCol)
    mixed
      .withColumn("__cum", sum(col("tok")).over(w))
      .withColumn("seq_id",
        floor((col("__cum") - col("tok")) / lit(seqTokens)))
      .groupBy(col(sourceCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("tok")).as("seq_tokens"),
           min(col(idCol)).as("first_doc"),
           max(col(idCol)).as("last_doc"))
      .orderBy(sourceCol, "seq_id")
  }

  /** The FULL export pipeline (c06's shape) over MAINTAINED state:
    * curated-semantic survivors (both dedup labelings read from their
    * state directories, Δ-folded by the streams) → train split →
    * per-source token-budget mixture → sequence packing. The whole
    * view costs one scan-local projection, two broadcast-able
    * keep-list joins, one |sources|-row totals aggregate, and one
    * per-source window — per refresh, regardless of how the clusters
    * were accumulated. */
  def exportPacked(docs: DataFrame, idCol: String, sourceCol: String,
                   textCol: String, statePath: String, semStatePath: String,
                   budgets: DataFrame, seqTokens: Long): DataFrame = {
    val keepers = IncrementalNearDup.clusters(docs, idCol, statePath)
      .filter(col(idCol) === col("cluster_id")).select(col(idCol))
    val semKeepers = IncrementalEmbeddingDedup.clusters(
        docs.select(col(idCol)), idCol, semStatePath)
      .filter(col(idCol) === col("cluster_id")).select(col(idCol))
    val surv = admitted(
      scoredWithSource(docs, idCol, sourceCol, textCol)
        .join(keepers, idCol).join(semKeepers, idCol))
    mixAndPack(surv, idCol, sourceCol, budgets, seqTokens)
  }

  /** One-shot batch reference for [[exportPacked]]: both cluster sets
    * recomputed from scratch, then the same mix-and-pack tail. */
  def exportPackedBatch(docs: DataFrame, idCol: String, sourceCol: String,
                        textCol: String, vecs: DataFrame, vecCol: String,
                        budgets: DataFrame, seqTokens: Long,
                        params: IncrementalNearDup.Params =
                          IncrementalNearDup.Params(),
                        semParams: IncrementalEmbeddingDedup.Params =
                          IncrementalEmbeddingDedup.Params()): DataFrame = {
    val pairs = Dedup.nearDuplicates(docs, idCol, textCol,
      params.shingleLen, params.numHashes, params.numBands,
      params.threshold, params.maxBucket)
    val keepers = ConnectedComponents.dupClusters(
        docs, idCol, pairs.select("a", "b"), "a", "b")
      .filter(col(idCol) === col("cluster_id")).select(col(idCol))
    val semPairs = graft.similarity.Similarity.cosineNearDuplicatesMulti(
      vecs, idCol, vecCol, semParams.threshold, semParams.numPlanes,
      semParams.tables, semParams.seed, semParams.maxBucket)
    val semKeepers = ConnectedComponents.dupClusters(
        vecs.select(col(idCol)), idCol,
        semPairs.select(col("a"), col("b")), "a", "b")
      .filter(col(idCol) === col("cluster_id")).select(col(idCol))
    val surv = admitted(
      scoredWithSource(docs, idCol, sourceCol, textCol)
        .join(keepers, idCol).join(semKeepers, idCol))
    mixAndPack(surv, idCol, sourceCol, budgets, seqTokens)
  }

  /** The export FINALIZATION over any packed-sequence frame (c08's
    * shape): deterministic md5(source#seq_id) shard assignment + the
    * per-shard manifest an export job writes next to its shard files.
    * RNG-free, so the streaming export's shard layout is reproducible
    * and STABLE under refreshes that don't change the sequences. One
    * |shards|-group aggregate — nothing new shuffles but the manifest
    * rows. */
  def exportManifest(seqs: DataFrame, sourceCol: String,
                     nShards: Int = 8): DataFrame = {
    val key = concat(col(sourceCol), lit("#"), col("seq_id").cast("string"))
    seqs
      .withColumn("shard_id", TextFunctions.md5Bucket(key, nShards)
        .cast("long"))
      .withColumn("__pick", md5(key))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_seqs"),
           sum(col("n_docs")).as("n_docs"),
           sum(col("seq_tokens")).as("shard_tokens"),
           min(col("__pick")).as("first_pick"))
      .orderBy("shard_id")
  }

  /** One-shot batch reference for [[curatedSemantic]]: both cluster
    * sets recomputed from scratch over the accumulated corpus (the
    * c03 composition). `vecs` carries (idCol, vecCol) embeddings
    * keyed like the docs. */
  def curatedSemanticBatch(docs: DataFrame, idCol: String, textCol: String,
                           vecs: DataFrame, vecCol: String,
                           params: IncrementalNearDup.Params =
                             IncrementalNearDup.Params(),
                           semParams: IncrementalEmbeddingDedup.Params =
                             IncrementalEmbeddingDedup.Params()): DataFrame = {
    val lex = curatedBatch(docs, idCol, textCol, params)
    val semPairs = graft.similarity.Similarity.cosineNearDuplicatesMulti(
      vecs, idCol, vecCol, semParams.threshold, semParams.numPlanes,
      semParams.tables, semParams.seed, semParams.maxBucket)
    val semKeepers = ConnectedComponents.dupClusters(
        vecs.select(col(idCol)), idCol,
        semPairs.select(col("a"), col("b")), "a", "b")
      .filter(col(idCol) === col("cluster_id")).select(col(idCol))
    lex.join(semKeepers, idCol).orderBy(idCol)
  }
}
