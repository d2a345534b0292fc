package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * [[bruteForceTopK]] is the exact baseline: one pass over the corpus,
  * a per-row fold for the dot product (codegen'd, no UDF), and a
  * TakeOrderedAndProject for the top-k — no global sort, no shuffle of
  * vectors.
  *
  * The scale path is [[withLshBuckets]] + [[annTopK]]: random-hyperplane
  * LSH (deterministic from a seed) buckets vectors by sign pattern, the
  * query probes only its own bucket (multi-probe = flip one bit at a
  * time), so a 100 TB corpus answers from a partition-pruned fraction.
  * Persist the bucketed table partitioned by `bucket` and the probe
  * becomes a partition-pruned scan.
  */
object Similarity {

  /** Dot product — the native codegen expression
    * ([[graft.functions.VectorDot]]): widen-to-double, left-to-right
    * accumulation, bit-identical to the HOF fold it replaced but
    * compiled into the whole-stage loop. */
  def dot(a: Column, b: Column): Column =
    graft.functions.vectors.vector_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Exact top-k by cosine against one query vector. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    corpus
      .withColumn("cosine", cosine(col(vecCol), q))
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Sign pattern of `numPlanes` random-hyperplane projections. The
    * hyperplane matrix is pseudo-random ±1 entries derived from
    * xxhash64(plane, dim-index, seed) — reproducible everywhere without
    * shipping a matrix. Returns an array<int> of 0/1. */
  def lshBits(vec: Column, numPlanes: Int, seed: Long): Column =
    array(Seq.tabulate(numPlanes) { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast("double") * when(
            pmod(xxhash64(lit(p), i, lit(seed)), lit(2L)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, 1).otherwise(0)
    }: _*)

  /** Pack the bit pattern into a single bucket id column. */
  def lshBucket(vec: Column, numPlanes: Int, seed: Long): Column =
    aggregate(lshBits(vec, numPlanes, seed), lit(0L),
      (acc, b) => acc * 2 + b)

  /** Corpus preparation: attach the LSH bucket (write partitioned by it
    * for partition-pruned probes). */
  def withLshBuckets(corpus: DataFrame, vecCol: String,
                     numPlanes: Int = 8, seed: Long = 42L): DataFrame =
    corpus.withColumn("bucket", lshBucket(col(vecCol), numPlanes, seed))

  /** ANN top-k: probe the query's bucket plus all single-bit-flip
    * neighbor buckets (multi-probe), rank candidates by exact cosine.
    * With b planes this scans ≈ (b+1)/2^b of the corpus. */
  def annTopK(bucketed: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int,
              numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val probes = probeBuckets(query, numPlanes, seed)
    bucketed
      .filter(col("bucket").isin(probes: _*))
      .withColumn("cosine", cosine(col(vecCol), array(query.map(lit): _*)))
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** The query's bucket and its single-bit-flip neighbors, computed with
    * the same Spark expressions as [[lshBucket]] (hash parity by
    * construction). */
  def probeBuckets(query: Seq[Float], numPlanes: Int, seed: Long): Seq[Long] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val q = array(query.map(lit): _*)
    val bucket = spark.range(1)
      .select(lshBucket(q, numPlanes, seed).as("b"))
      .head().getLong(0)
    bucket +: Seq.tabulate(numPlanes)(p => bucket ^ (1L << p))
  }

  // ---- IVF (inverted-file) variant: coarse quantizer + probed lists ----

  /** Deterministic coarse centroids: every ⌈n/k⌉-th vector by id order.
    * A k-means refinement would drop in here; deterministic striding
    * keeps tests and re-builds reproducible, and for ANN the quantizer
    * only needs to be *fixed*, not optimal. Centroids are collected to
    * the driver — k is small (√n-ish) by construction. */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int): Array[(Int, Seq[Float])] = {
    val n = corpus.count()
    val stride = math.max(1L, n / k)
    // stride on the id value — a distributed filter, no global sort
    corpus.select(col(idCol), col(vecCol))
      .filter(pmod(col(idCol), lit(stride)) === 0)
      .orderBy(col(idCol))
      .limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }
  }

  private def nearestCentroid(vec: Column,
                              centroids: Array[(Int, Seq[Float])]): Column = {
    // argmin over the (broadcast-literal) centroid set, unrolled —
    // k is small, each distance is one codegen'd vector_dot
    val dists = centroids.map { case (i, c) =>
      val cl = array(c.map(lit): _*)
      (i, dot(vec, vec) - lit(2.0) * dot(vec, cl) + dot(cl, cl))
    }
    val minDist = dists.map(_._2).reduce((a, b) => least(a, b))
    dists.foldRight(lit(-1): Column) { case ((i, d), els) =>
      when(d === minDist, lit(i)).otherwise(els)
    }
  }

  /** Corpus preparation: assign each vector to its nearest coarse
    * centroid ("inverted list"). Persist partitioned by `ivf_list` and
    * a probe reads only the probed lists. */
  def withIvfLists(corpus: DataFrame, vecCol: String,
                   centroids: Array[(Int, Seq[Float])]): DataFrame =
    corpus.withColumn("ivf_list", nearestCentroid(col(vecCol), centroids))

  /** IVF ANN top-k: rank the `nProbe` centroids nearest to the query,
    * scan only those inverted lists, re-rank candidates by exact
    * cosine. Scans ≈ nProbe/k of the corpus. */
  def ivfTopK(listed: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int,
              centroids: Array[(Int, Seq[Float])], nProbe: Int = 3): DataFrame = {
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val probes = centroids.sortBy { case (_, c) => d2(query, c) }
      .take(nProbe).map(_._1)
    listed
      .filter(col("ivf_list").isin(probes.toIndexedSeq: _*))
      .withColumn("cosine", cosine(col(vecCol), array(query.map(lit): _*)))
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
