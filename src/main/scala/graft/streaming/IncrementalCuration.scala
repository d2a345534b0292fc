package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, Dedup}
import graft.text.TextFunctions

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
}
