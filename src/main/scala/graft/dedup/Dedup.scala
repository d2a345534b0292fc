package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines, at three
  * rigor/cost tiers:
  *
  *  1. [[exact]] — byte-identical (or canonical-form) duplicates via a
  *     single hash-partitioned shuffle.
  *  2. [[nearDuplicates]] — MinHash + banded LSH: shingle → minhash
  *     signature → band buckets → candidate join → exact Jaccard
  *     verify. Only bucket-mates are ever paired, so the quadratic
  *     blow-up is confined to buckets (which [[lshCandidates]] also
  *     caps, dropping degenerate mega-buckets — the classic skew guard
  *     at corpus scale).
  *  3. [[simhashSignature]]/[[simhashNearDuplicates]] — SimHash bit
  *     signatures computed as pure per-row folds (no explode, no
  *     shuffle), candidates via chunk collisions, verify by Hamming
  *     distance.
  *
  * Embedding-space near-dup lives in graft.similarity (cosine ≥ τ over
  * LSH buckets).
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical content. Grouping
    * key is the content hash, not the content — the shuffle moves 8-byte
    * keys plus the row, and the winner is resolved with one min-agg
    * (map-side partials) instead of a full sort. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(contentCol)), col(contentCol))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("dup_count", count(lit(1)).over(
        Window.partitionBy(xxhash64(col(contentCol)), col(contentCol))))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the document's shingle set. Pure projection. */
  def minhashSignature(text: Column, shingleLen: Int, numHashes: Int): Column =
    transform(sequence(lit(1), lit(numHashes)),
      seed => array_min(transform(
        TextFunctions.shingles(text, shingleLen), s => xxhash64(s, seed))))

  /** Banded LSH candidate pairs over a minhash signature column.
    * Documents sharing any band key become a candidate pair.
    * Buckets larger than `maxBucket` are dropped (boilerplate/empty-doc
    * mega-buckets would otherwise go quadratic). */
  def lshCandidates(docs: DataFrame, idCol: String, sigCol: String,
                    numBands: Int, rowsPerBand: Int,
                    maxBucket: Int = 1000): DataFrame = {
    val bandKeys = docs.select(col(idCol), posexplode(
      transform(sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
      .as(Seq("band", "key")))
    val small = bandKeys.groupBy("band", "key")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    // pair within bucket: explode twice with an ordering guard
    small.select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
  }

  /** End-to-end MinHash near-dup: candidates verified with exact
    * n-gram Jaccard ≥ `threshold`. Returns (a, b, jaccard). */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     shingleLen: Int = 3, numHashes: Int = 64,
                     numBands: Int = 16, threshold: Double = 0.7,
                     maxBucket: Int = 1000): DataFrame = {
    require(numHashes % numBands == 0, "bands must tile the signature")
    val sigs = docs.select(col(idCol),
      TextFunctions.shingles(col(textCol), shingleLen).as("__sh"),
      minhashSignature(col(textCol), shingleLen, numHashes).as("__sig"))
    val cands = lshCandidates(sigs, idCol, "__sig",
      numBands, numHashes / numBands, maxBucket)
    val sh = sigs.select(col(idCol), col("__sh"))
    cands
      .join(sh.withColumnRenamed(idCol, "a").withColumnRenamed("__sh", "__sha"), "a")
      .join(sh.withColumnRenamed(idCol, "b").withColumnRenamed("__sh", "__shb"), "b")
      .withColumn("jaccard", jaccard(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** ±1 contribution of one token to each of the 64 SimHash slots.
    * The single-element transform binds the token hash once so the 64
    * bit probes share one xxhash64 evaluation. */
  private def signedBits(t: Column): Column =
    element_at(transform(array(xxhash64(t)), h =>
      array(Seq.tabulate(64) { j =>
        when(shiftright(h, j).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1)
      }: _*)), 1)

  /** SimHash as a 64-slot bit array, computed with per-row folds only:
    * slot j = sign of Σ_tokens (±1 by bit j of xxhash64(token)).
    * No explode, no shuffle — a projection over the scan. */
  def simhashSignature(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val counts = aggregate(toks, array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc, signedBits(t), (a, b) => a + b))
    transform(counts, c => when(c > 0, 1).otherwise(0))
  }

  /** Hamming distance between two equal-length bit arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0), (acc, x) => acc + x)

  /** SimHash near-dup: candidates collide on any 16-bit signature
    * chunk (pigeonhole: hamming ≤ 3 over 64 bits guarantees one of the
    * four chunks is identical), verified by full Hamming ≤ `maxHamming`. */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int = 3,
                            maxBucket: Int = 1000): DataFrame = {
    val sigs = docs.select(col(idCol), simhashSignature(col(textCol)).as("__sig"))
    val cands = lshCandidates(sigs, idCol, "__sig", numBands = 4,
      rowsPerBand = 16, maxBucket = maxBucket)
    val s = sigs.select(col(idCol), col("__sig"))
    cands
      .join(s.withColumnRenamed(idCol, "a").withColumnRenamed("__sig", "__siga"), "a")
      .join(s.withColumnRenamed(idCol, "b").withColumnRenamed("__sig", "__sigb"), "b")
      .withColumn("hamming", hamming(col("__siga"), col("__sigb")))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }
}
