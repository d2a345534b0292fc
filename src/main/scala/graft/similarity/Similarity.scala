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

  /** The catalog's e03/e04 LSH pair-set parameters — ONE definition
    * shared by the queries (`Queries.lshCosinePairs`), the recall gate
    * (LshScaleGateSpec), and the oracle comment: the e03/e04 oracle
    * rows reuse the exact brute-force SQL, which is sound only while
    * multi-table recall at THESE parameters is 100% on the shipped
    * corpora. Any tweak changes gate and catalog together, so a drift
    * fails the recall gate first — not the driver hash check. */
  val PairThreshold = 0.4
  val PairTables = 20

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

  /** Exact nearest neighbor PER VECTOR (self-kNN, k=1) — the canonical
    * embedding-dedup primitive: each vector paired with its closest
    * other vector by cosine. Ties break on the neighbor id; cosine is
    * rounded to 4dp BEFORE the argmax so the winner is stable across
    * engines and partitionings.
    *
    * This is the exact O(n²) baseline (codegen'd VectorDot per pair,
    * no vector shuffle — the join broadcasts the smaller side or
    * shuffles by id, both fine). At corpus scale run the same argmax
    * within LSH buckets ([[withLshBuckets]] + multi-probe) — the
    * approximate form trades the n² for bucket-local work. */
  def selfNearestNeighbor(corpus: DataFrame, idCol: String,
                          vecCol: String): DataFrame = {
    // norms are computed ONCE per side (n work), not once per pair
    // (n² work) — the pair loop then runs one VectorDot, not three.
    // Same doubles as cosine(): identical products, identical order.
    val x = corpus.select(col(idCol).as("id"), col(vecCol).as("__vx"),
      norm(col(vecCol)).as("__nx"))
    val y = corpus.select(col(idCol).as("nn"), col(vecCol).as("__vy"),
      norm(col(vecCol)).as("__ny"))
    // argmax as a max-of-struct aggregation, NOT a window: the n² pair
    // stream folds through map-side partial maxes instead of being
    // shuffled and sorted whole. (cosine desc, nn asc) as one `min`
    // over struct(-cosine, nn) — only the always-numeric cosine is
    // negated, so string/UUID id columns order correctly too (same
    // pattern as nearestFromPairs); same winner as the rn=1 window.
    x.join(y, col("id") =!= col("nn"))
      .withColumn("cosine", round(
        when(col("__nx") * col("__ny") === 0, 0.0)
          .otherwise(dot(col("__vx"), col("__vy")) / (col("__nx") * col("__ny"))),
        4))
      .groupBy("id")
      .agg(min(struct((-col("cosine")).as("__negc"), col("nn"))).as("__m"))
      .select(col("id"), col("__m.nn").as("nn"),
              (-col("__m.__negc")).as("cosine"))
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

  /** Bucket id = packed sign pattern of `numPlanes` random-hyperplane
    * projections. The hyperplane matrix is pseudo-random ±1 entries
    * derived from a splitmix64 mix of (plane, dim-index, seed) —
    * reproducible everywhere without shipping a matrix. Native codegen
    * expression ([[graft.functions.vectors.vector_lsh_bucket]]): one
    * primitive loop per row, no interpreted lambdas in the per-row hot
    * path. */
  def lshBucket(vec: Column, numPlanes: Int, seed: Long): Column =
    graft.functions.vectors.vector_lsh_bucket(vec, numPlanes, seed)

  /** Corpus preparation: attach the LSH bucket (write partitioned by it
    * for partition-pruned probes). */
  def withLshBuckets(corpus: DataFrame, vecCol: String,
                     numPlanes: Int = 8, seed: Long = 42L): DataFrame =
    corpus.withColumn("bucket", lshBucket(col(vecCol), numPlanes, seed))

  // ---- persisted indexes: build once, probe partition-pruned ----
  //
  // The build step is the 100 TB posture: bucket/list assignment runs
  // ONCE over the corpus and lands partitioned by bucket/ivf_list, so
  // a probe is a partition-pruned read of ≈ probes/2^b (LSH) or
  // ≈ nProbe/k (IVF) of the data — never a full-corpus recompute per
  // query. Probes assert this in SimilarityIvfSpec via the scan's
  // PartitionFilters.

  private def indexExists(df: DataFrame, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(df.sparkSession.sessionState.newHadoopConf()).exists(p)
  }

  /** Build (or reuse) the LSH index at `path`, partitioned by bucket.
    * Returns the index frame; filters on `bucket` prune partitions. */
  def ensureLshIndex(corpus: DataFrame, vecCol: String, path: String,
                     numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    if (!indexExists(corpus, path))
      // repartition on the partition column first: one file per bucket
      // instead of (tasks × buckets) small files — the write and every
      // later pruned read stay proportional to the data, not the task
      // grid
      withLshBuckets(corpus, vecCol, numPlanes, seed)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
    corpus.sparkSession.read.parquet(path)
  }

  /** Per-table seed for the multi-table (OR-amplified) LSH surfaces —
    * one shared definition so index build, pair join, and probes can
    * never disagree. The multiplier is unrelated to the plane/dim mix
    * constants (no aliasing); splitmix64's finalizer decorrelates the
    * tables. */
  private[graft] def tableSeed(seed: Long, t: Int): Long =
    seed + t * 0x5851F42D4C957F2DL

  /** Build (or reuse) a MULTI-TABLE LSH index at `path`: each vector
    * appears once per hash table under the combined (table, bucket)
    * key `tb` — the standard multi-index LSH trade (tables× storage
    * for OR-amplified recall; single-table probes at this
    * dimensionality/similarity miss most true neighbors).
    *
    * Layout: RANGE-partitioned and sorted on `tb`, so every parquet
    * file covers a contiguous key slice and a probe's `tb IN (...)`
    * predicate skips non-matching files/row-groups from footer
    * min/max stats alone — file-granularity pruning with a BOUNDED
    * file count. (A hive-style partitionBy("tb") dir per key would
    * prune identically but mints tables·2^planes directories — small-
    * file pathology at any corpus size where buckets ≪ files make
    * sense.) */
  def ensureLshIndexMulti(corpus: DataFrame, vecCol: String, path: String,
                          numPlanes: Int = 8, tables: Int = 8,
                          seed: Long = 42L): DataFrame = {
    if (!indexExists(corpus, path))
      corpus.withColumn("tb", explode(array(Seq.tabulate(tables)(t =>
          lit(t.toLong * (1L << numPlanes)) +
            lshBucket(col(vecCol), numPlanes, tableSeed(seed, t))): _*)))
        .repartitionByRange(col("tb"))
        .sortWithinPartitions("tb")
        .write.mode("overwrite").parquet(path)
    corpus.sparkSession.read.parquet(path)
  }

  /** ANN top-k against the multi-table index: per table, probe the
    * query's bucket plus all single-bit flips (buckets computed
    * DRIVER-side); candidates found by several tables dedupe by id
    * before the exact re-rank. */
  def annTopKMulti(indexed: DataFrame, idCol: String, vecCol: String,
                   query: Seq[Float], k: Int, numPlanes: Int = 8,
                   tables: Int = 8, seed: Long = 42L): DataFrame = {
    val probes = (0 until tables).flatMap { t =>
      probeBuckets(query, numPlanes, tableSeed(seed, t))
        .map(b => t.toLong * (1L << numPlanes) + b)
    }
    indexed
      .filter(col("tb").isin(probes: _*))
      .dropDuplicates(idCol)
      .withColumn("cosine", cosine(col(vecCol), array(query.map(lit): _*)))
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Build (or reuse) the IVF index at `path`: corpus partitioned by
    * `ivf_list` plus a `.centroids` sidecar so probes don't recompute
    * the quantizer. Returns (index frame, centroids). */
  def ensureIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                     path: String, k: Int): (DataFrame, Array[(Int, Seq[Float])]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    if (!indexExists(corpus, path)) {
      val cents = ivfCentroids(corpus, idCol, vecCol, k)
      cents.toSeq.toDF("ivf_list", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path + ".centroids")
      withIvfLists(corpus, vecCol, cents)
        .repartition(col("ivf_list"))
        .write.mode("overwrite").partitionBy("ivf_list").parquet(path)
    }
    val cents = spark.read.parquet(path + ".centroids")
      .as[(Int, Seq[Float])].collect().sortBy(_._1)
    (spark.read.parquet(path), cents)
  }

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

  /** Exact embedding near-duplicate PAIRS: every (a, b), a < b, whose
    * cosine — rounded to 4dp BEFORE the threshold test, so boundary
    * pairs agree across engines — reaches `threshold`. This is the
    * O(n²) exact baseline of [[cosineNearDuplicates]] (same contract,
    * LSH candidates instead of all pairs): run this at validation
    * scale, the LSH form at corpus scale. The pair stream is codegen'd
    * VectorDot work with no vector shuffle beyond the self-join. */
  def exactCosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    // per-side norm precompute, as in selfNearestNeighbor
    val x = corpus.select(col(idCol).as("a"), col(vecCol).as("__vx"),
      norm(col(vecCol)).as("__nx"))
    val y = corpus.select(col(idCol).as("b"), col(vecCol).as("__vy"),
      norm(col(vecCol)).as("__ny"))
    x.join(y, col("a") < col("b"))
      .withColumn("cosine", round(
        when(col("__nx") * col("__ny") === 0, 0.0)
          .otherwise(dot(col("__vx"), col("__vy")) / (col("__nx") * col("__ny"))),
        4))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** Embedding-space near-duplicate PAIRS: all (a, b) with cosine ≥
    * `threshold`, candidates from hyperplane-LSH buckets. Each vector
    * enters its own bucket plus every single-bit-flip neighbor, so any
    * pair whose sign patterns differ in ≤ 2 planes collides somewhere
    * (near-identical vectors differ in ~0 planes); verification is
    * exact cosine, bucket-local (vectors ship once per probe bucket,
    * never per pair — the d02 discipline). `maxBucket` caps degenerate
    * buckets, the skew guard at corpus scale. Approximate recall by
    * construction (like every LSH near-dup); planted-pair recall is
    * spec-checked in ExtensionsSpec. */
  def cosineNearDuplicates(corpus: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, numPlanes: Int = 8,
                           seed: Long = 42L, maxBucket: Int = 1000): DataFrame = {
    val bucketed = withLshBuckets(corpus, vecCol, numPlanes, seed)
    val probeCols = col("bucket") +:
      Seq.tabulate(numPlanes)(p => col("bucket").bitwiseXOR(lit(1L << p)))
    val probes = bucketed.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      explode(array(probeCols: _*)).as("__bk"))
    val buckets = probes.groupBy("__bk")
      .agg(collect_list(struct(col("__id"), col("__v"))).as("__ms"))
      .filter(size(col("__ms")).between(2, maxBucket))
    buckets
      .select(col("__ms"), explode(col("__ms")).as("x"))
      .select(col("x"), explode(col("__ms")).as("y"))
      .filter(col("x.__id") < col("y.__id"))
      .withColumn("cosine", round(cosine(col("x.__v"), col("y.__v")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("x.__id").as("a"), col("y.__id").as("b"), col("cosine"))
      .distinct()
  }

  /** OR-amplified multi-table LSH near-duplicate pairs: every (a, b),
    * a < b, with exact cosine ≥ `threshold` (rounded to 4dp first, as
    * in [[exactCosinePairs]] — same contract, LSH candidates instead
    * of all pairs). Each of the `tables` independent hyperplane tables
    * probes home + single-bit-flip buckets, so a pair is a candidate
    * when its sign patterns differ in ≤ 2 planes in ANY table — the
    * classic OR-amplification that drives per-pair miss probability
    * down exponentially in `tables`.
    *
    * Shape at corpus scale: candidate generation ships only (table,
    * bucket, id) longs; candidate ids are distinct-ed BEFORE
    * verification (ids are two longs — the distinct is narrow), and
    * vectors join back once per unique candidate pair (dim-fixed rows;
    * Spark broadcasts the vector side when small, hash-joins on id
    * otherwise) — vectors never fan out per bucket. `maxBucket` drops
    * degenerate buckets per (table, bucket), the skew cap; a pair
    * capped in one table still surfaces from any other.
    *
    * Recall is probabilistic by construction (like every LSH method):
    * subset-of-exact ALWAYS holds (verification is exact), and the
    * shipped corpora are measured at 100% recall with the default
    * `tables` (pinned in LshScaleGateSpec), which is what lets the
    * driver hash-check this against the brute-force oracle. */
  def cosineNearDuplicatesMulti(corpus: DataFrame, idCol: String, vecCol: String,
                                threshold: Double, numPlanes: Int = 8,
                                tables: Int = 16, seed: Long = 42L,
                                maxBucket: Int = 4000): DataFrame = {
    require(tables >= 1, s"tables must be >= 1, got $tables")
    val tableSeeds = Seq.tabulate(tables)(t => tableSeed(seed, t))
    val base = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val homes = array(tableSeeds.map(s => lshBucket(col("__v"), numPlanes, s)): _*)
    val probes = base
      .select(col("__id"), posexplode(homes).as(Seq("__t", "__b")))
      .select(col("__id"), col("__t"),
        explode(array(col("__b") +: Seq.tabulate(numPlanes)(p =>
          col("__b").bitwiseXOR(lit(1L << p))): _*)).as("__bk"))
    val cand = probes.groupBy("__t", "__bk")
      .agg(collect_list(col("__id")).as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucket))
      .select(col("__ids"), explode(col("__ids")).as("a"))
      .select(col("a"), explode(col("__ids")).as("b"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val xa = corpus.select(col(idCol).as("a"), col(vecCol).as("__vx"),
      norm(col(vecCol)).as("__nx"))
    val xb = corpus.select(col(idCol).as("b"), col(vecCol).as("__vy"),
      norm(col(vecCol)).as("__ny"))
    cand.join(xa, "a").join(xb, "b")
      .withColumn("cosine", round(
        when(col("__nx") * col("__ny") === 0, 0.0)
          .otherwise(dot(col("__vx"), col("__vy")) / (col("__nx") * col("__ny"))),
        4))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** Bucketed self-nearest-neighbor: for each vector whose best
    * neighbor reaches `minCosine`, that neighbor — the LSH-scale form
    * of [[selfNearestNeighbor]] restricted to the near-dup band.
    * Argmax over the multi-table verified pairs; when pair recall at
    * `minCosine` is 100% (measured on the shipped corpora) this equals
    * the exact argmax filtered to best ≥ `minCosine`: the filtered-out
    * vectors' candidates all verify below the floor, and a found
    * vector's true best IS among its candidates. Same tie rule as the
    * exact form: (cosine desc, neighbor id asc) on 4dp-rounded cosine. */
  def selfNearestNeighborBucketed(corpus: DataFrame, idCol: String,
                                  vecCol: String, minCosine: Double,
                                  numPlanes: Int = 8, tables: Int = 16,
                                  seed: Long = 42L,
                                  maxBucket: Int = 4000): DataFrame =
    nearestFromPairs(cosineNearDuplicatesMulti(
      corpus, idCol, vecCol, minCosine, numPlanes, tables, seed, maxBucket))

  /** Per-id argmax over an undirected (a, b, cosine) pair set — the
    * reduce step shared by the bucketed self-NN and any precomputed
    * pair table. Map-side partial maxes, no window. The (cosine desc,
    * nn asc) tie-break is one `min` over `struct(-cosine, nn)`: only
    * the always-numeric cosine is negated, so string/UUID neighbor ids
    * order correctly too (struct comparison is lexicographic). */
  def nearestFromPairs(pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("a").as("id"), col("b").as("nn"), col("cosine"))
      .unionAll(pairs.select(col("b").as("id"), col("a").as("nn"), col("cosine")))
    sym.groupBy("id")
      .agg(min(struct((-col("cosine")).as("__negc"), col("nn"))).as("__m"))
      .select(col("id"), col("__m.nn").as("nn"),
              (-col("__m.__negc")).as("cosine"))
  }

  /** Cross-table cosine similarity JOIN via multi-table LSH — the
    * batch-retrieval sibling of [[cosineNearDuplicatesMulti]]: every
    * (left, right) pair with cosine ≥ `threshold`, for a BATCH of
    * query vectors against a corpus (near-dup lookup, embedding-space
    * decontamination, cross-store asset matching). Same recall
    * construction as the self form (OR over `tables` independent
    * plane sets), with the 1-bit probe expansion on the LEFT side by
    * default — duplicate-grade retrieval (hamming-0 bucket hits)
    * never needs more, and expanding both sides multiplies probe
    * volume. `expandRight = true` restores the self form's full
    * flip-meets-flip reach (effective hamming-2) for THRESHOLD-grade
    * joins on hard corpora — the regime where
    * [[cosineNearDuplicatesMulti]]'s measured-100% recall was
    * established; use it when the background cosine mass sits near
    * the threshold (e.g. embedding-space decontamination).
    *
    * Scale shape: candidate generation ships (table, bucket, id)
    * longs for both sides, one hash-agg groups a bucket's two id
    * lists, pairs are left×right within the bucket (never
    * left×left), candidate ids distinct BEFORE the exact verify, and
    * vectors join back once per unique pair. `maxBucket` caps the
    * combined bucket population (skew guard, same contract as the
    * self form: a pair capped in one table still surfaces from any
    * other). Output: (a = left id, b = right id, cosine 4dp). */
  def cosineJoinMulti(left: DataFrame, leftId: String,
                      right: DataFrame, rightId: String, vecCol: String,
                      threshold: Double, numPlanes: Int = 8,
                      tables: Int = 16, seed: Long = 42L,
                      maxBucket: Int = 4000,
                      expandRight: Boolean = false,
                      center: Boolean = false): DataFrame = {
    require(tables >= 1, s"tables must be >= 1, got $tables")
    val tableSeeds = Seq.tabulate(tables)(t => tableSeed(seed, t))
    // `center = true`: STANDARDIZE against the RIGHT (corpus) per-dim
    // mean and standard deviation before hyperplane bucketing —
    // verification still runs on the RAW cosine, so results are
    // unchanged in definition; only candidate generation changes.
    // Natural-content embeddings (byte-n-gram profiles, TF-style
    // vectors) share a large common component, so origin-through
    // hyperplane signs correlate and a handful of bucket patterns
    // swallow the corpus: candidate volume grows super-linearly
    // (measured on m04: ×95 shuffle at ×10 corpus). Mean-centering
    // decorrelates the DC component; dividing by the per-dim std
    // removes the residual dominance of a few high-variance dims
    // (byte-frequency features are strongly heteroscedastic — without
    // the scaling those dims alone decide most hyperplane signs and
    // the effective code length collapses, measured as a 3.6 GB
    // candidate shuffle at ×100). Both stats come from ONE map-side-
    // combined aggregation, dim-bounded at the driver; near-constant
    // dims keep a floor so they contribute ~nothing, exactly right.
    val adjust: Column => Column = if (!center) identity else {
      val stats = right
        .select(posexplode(col(vecCol)).as(Seq("__p", "__x")))
        .groupBy("__p").agg(avg(col("__x")).as("__m"),
          stddev_pop(col("__x")).as("__s"))
        .orderBy("__p").collect()
        .map(r => (r.getDouble(1), math.max(r.getDouble(2), 1e-6)))
      val meanLit = array(stats.toIndexedSeq.map(s => lit(s._1.toFloat)): _*)
      val sdLit = array(stats.toIndexedSeq.map(s => lit(s._2.toFloat)): _*)
      v => zip_with(zip_with(v, meanLit, (x, m) => x - m), sdLit,
        (x, s) => x / s)
    }
    // Bucket entries carry an int16-quantized sketch of the RAW vector
    // (graft.functions.vectors.vector_q16 — ≈136 B at dim 64) so pairs
    // are prefiltered on an ERROR-BOUNDED approximate cosine INSIDE
    // the bucket, before anything pair-shaped is shuffled. On
    // correlated corpora the bucket-collision mass sits well below the
    // threshold (measured on m04 ×100: ~490M candidate id-pairs → a
    // 7.8 GB distinct exchange, for 13.5k survivors); the q16 cosine
    // is within 2.5e-4 of the true cosine, so filtering at
    // (threshold − 0.01) provably drops no pair the exact verify would
    // keep, and the pair exchange shrinks to the near-threshold
    // survivors. The exact verify below still decides on raw floats.
    def homes(df: DataFrame, id: String) = {
      val hs = array(tableSeeds.map(s =>
        lshBucket(adjust(col(vecCol)), numPlanes, s)): _*)
      df.select(col(id).as("__id"),
          graft.functions.vectors.vector_q16(col(vecCol)).as("__q"),
          posexplode(hs).as(Seq("__t", "__b")))
    }
    def expanded(base: DataFrame) = base
      .select(col("__id"), col("__q"), col("__t"),
        explode(array(col("__b") +: Seq.tabulate(numPlanes)(p =>
          col("__b").bitwiseXOR(lit(1L << p))): _*)).as("__bk"))
    val lp = expanded(homes(left, leftId)).withColumn("__s", lit(0))
    val rpBase = homes(right, rightId)
    val rp = (if (expandRight) expanded(rpBase)
              else rpBase.select(col("__id"), col("__q"), col("__t"),
                col("__b").as("__bk")))
      .withColumn("__s", lit(1))
    val entry = struct(col("__id"), col("__q"))
    val cand = lp.unionByName(rp).groupBy("__t", "__bk")
      .agg(collect_list(when(col("__s") === 0, entry)).as("__la"),
           collect_list(when(col("__s") === 1, entry)).as("__lb"))
      .filter(size(col("__la")) >= 1 && size(col("__lb")) >= 1 &&
        size(col("__la")) + size(col("__lb")) <= maxBucket)
      .select(explode(col("__la")).as("__x"), col("__lb"))
      .select(col("__x"), explode(col("__lb")).as("__y"))
      .filter(graft.functions.vectors.q16_cosine(
        col("__x.__q"), col("__y.__q")) >= threshold - 0.01)
      .select(col("__x.__id").as("a"), col("__y.__id").as("b"))
      .distinct()
    val xa = left.select(col(leftId).as("a"), col(vecCol).as("__vx"),
      norm(col(vecCol)).as("__nx"))
    val xb = right.select(col(rightId).as("b"), col(vecCol).as("__vy"),
      norm(col(vecCol)).as("__ny"))
    cand.join(xa, "a").join(xb, "b")
      .withColumn("cosine", round(
        when(col("__nx") * col("__ny") === 0, 0.0)
          .otherwise(dot(col("__vx"), col("__vy")) / (col("__nx") * col("__ny"))),
        4))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** Per-LEFT-id argmax over a DIRECTED (a, b, cosine) pair set from
    * [[cosineJoinMulti]] — for each query, its best corpus match.
    * Map-side partial maxes; (cosine desc, b asc) tie-break via one
    * `min` over `struct(-cosine, b)`, the [[nearestFromPairs]]
    * convention. */
  def nearestFromPairsDirected(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("a").as("id"))
      .agg(min(struct((-col("cosine")).as("__negc"), col("b"))).as("__m"))
      .select(col("id"), col("__m.b").as("nn"),
              (-col("__m.__negc")).as("cosine"))

  /** The query's bucket and its single-bit-flip neighbors. The bucket
    * id is computed DRIVER-SIDE by the expression's local twin
    * ([[graft] VectorLshBucket.evalLocal] — same constants, parity
    * spec-checked), so an ANN probe costs zero Spark jobs before the
    * partition-pruned scan itself. */
  def probeBuckets(query: Seq[Float], numPlanes: Int, seed: Long): Seq[Long] = {
    val bucket = org.apache.spark.sql.graft.VectorLshBucket
      .evalLocal(query, numPlanes, seed)
    bucket +: Seq.tabulate(numPlanes)(p => bucket ^ (1L << p))
  }

  // ---- IVF (inverted-file) variant: coarse quantizer + probed lists ----

  /** Deterministic coarse centroids: every ⌈n/k⌉-th vector by id order
    * as seeds, then `refineSteps` Lloyd passes (assign each vector to
    * its nearest centroid, recenter each list on its mean — one
    * distributed aggregation per pass, nothing quadratic). Centroids
    * are collected to the driver — k is small (√n-ish) by
    * construction.
    *
    * Everything stays REPRODUCIBLE: the seeds are a pure function of
    * the ids, and the per-list means aggregate as decimals — decimal
    * addition is order-independent, so the result doesn't depend on
    * shuffle-block arrival order the way double sums would (the
    * persisted-index round-trip spec asserts recompute == sidecar
    * bit-for-bit). Decimal aggs cost more than double aggs, but the
    * quantizer build is a one-time k·dim-bounded step. */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, refineSteps: Int = 1): Array[(Int, Seq[Float])] = {
    val n = corpus.count()
    val stride = math.max(1L, n / k)
    // stride on the id value — a distributed filter, no global sort
    var cents = corpus.select(col(idCol), col(vecCol))
      .filter(pmod(col(idCol), lit(stride)) === 0)
      .orderBy(col(idCol))
      .limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }
    if (cents.isEmpty) return cents
    val dim = cents.head._2.length
    for (_ <- 0 until refineSteps) {
      val avgs = Seq.tabulate(dim)(j =>
        avg(col(vecCol)(j).cast("decimal(30,12)")).as(s"__c$j"))
      // decimal(30,12) holds |x| < 1e18 — any component that overflows
      // the cast averages to NULL, and that list keeps its previous
      // centroid rather than NPE-ing or recentring on a silent subset
      // (embeddings are unit-scale in practice; this is a guard, not a
      // supported range).
      val means = withIvfLists(corpus, vecCol, cents)
        .groupBy("ivf_list").agg(avgs.head, avgs.tail: _*)
        .collect().flatMap { r =>
          if ((1 to dim).exists(r.isNullAt)) None
          else Some(r.getInt(0) -> Seq.tabulate(dim)(j =>
            r.getDecimal(j + 1).floatValue()))
        }.toMap
      // a list that captured no vectors keeps its seed centroid
      cents = cents.map { case (i, c) => (i, means.getOrElse(i, c)) }
    }
    cents
  }

  private def nearestCentroid(vec: Column,
                              centroids: Array[(Int, Seq[Float])]): Column = {
    // Argmin over the (broadcast-literal) centroid set as ONE distance
    // array + array_position(array_min): k codegen'd vector_dot calls,
    // O(k) expression size. (The earlier when-chain re-inlined the
    // k-way least() into every branch — O(k²) generated code, which
    // blew past janino's method limit and forced interpreted
    // fallback.) ‖v‖² is constant across centroids, so the argmin only
    // needs ‖c‖² − 2·v·c; ‖c‖² folds to a Scala-level literal.
    // Ties: array_position picks the first (lowest-id) centroid, same
    // as the when-chain it replaces.
    val dists = array(centroids.map { case (_, c) =>
      val cl = array(c.map(lit): _*)
      val cc = c.map(x => x.toDouble * x).sum
      lit(cc) - lit(2.0) * dot(vec, cl)
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Corpus preparation: assign each vector to its nearest coarse
    * centroid ("inverted list"). Persist partitioned by `ivf_list` and
    * a probe reads only the probed lists. */
  def withIvfLists(corpus: DataFrame, vecCol: String,
                   centroids: Array[(Int, Seq[Float])]): DataFrame =
    corpus.withColumn("ivf_list", nearestCentroid(col(vecCol), centroids))

  /** Probe-list selection for RANKED MULTIPROBE with a distance-margin
    * budget: lists in centroid-distance order, cut where the next
    * centroid is farther than (1+alpha)·d²(best) — a query deep inside
    * one cell probes 1 list, a query near a cell boundary probes the
    * contested few; `maxProbe` bounds the worst case. Driver-side and
    * zero Spark jobs, like [[probeBuckets]]. */
  def adaptiveProbes(query: Seq[Float], centroids: Array[(Int, Seq[Float])],
                     alpha: Double = 0.15, maxProbe: Int = 8): Seq[Int] = {
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val ranked = centroids.map { case (i, c) => (i, d2(query, c)) }
      .sortBy { case (i, d) => (d, i) }
    val best = ranked.head._2
    ranked.takeWhile { case (_, d) => d <= best * (1 + alpha) }
      .take(math.max(1, maxProbe)).map(_._1).toIndexedSeq
  }

  /** [[ivfTopK]] with the margin-adaptive probe set: same re-rank,
    * per-query scan budget concentrated where centroid margins are
    * tight. On a separated corpus this reaches fixed-nProbe recall at
    * a fraction of the scan (pinned in SimilarityIvfSpec); on a
    * gapless corpus margins carry no signal and it degenerates to
    * ranked fixed-probe behavior (measured — BENCH_NOTES round 6). */
  def ivfTopKAdaptive(listed: DataFrame, idCol: String, vecCol: String,
                      query: Seq[Float], k: Int,
                      centroids: Array[(Int, Seq[Float])],
                      alpha: Double = 0.15, maxProbe: Int = 8): DataFrame = {
    val probes = adaptiveProbes(query, centroids, alpha, maxProbe)
    listed
      .filter(col("ivf_list").isin(probes: _*))
      .withColumn("cosine", cosine(col(vecCol), array(query.map(lit): _*)))
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

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

  // ===== Product quantization (PQ) =================================
  // The third ANN index family, for the regime where even the vectors
  // are too big to scan: each vector compresses to M small codes
  // (M·log2(ksub) bits), the per-query candidate scan reads ONLY the
  // code column (parquet column pruning — the vector bytes never move),
  // and exact cosine re-ranks a bounded candidate set. At 100 TB the
  // ADC scan is ~1/100th the bytes of the raw vectors; LSH/IVF prune
  // ROWS, PQ prunes BYTES, and the families compose (IVF-PQ) if needed.

  /** L2-normalize a float-vector column (zero vectors pass through).
    * PQ trains, encodes, and scores in the normalized space so ADC's
    * L2 order IS cosine order; the re-rank uses the raw vectors. */
  private def normalized(vec: Column): Column = {
    val n = norm(vec)
    when(n === 0, vec.cast("array<float>"))
      .otherwise(transform(vec, x => x / n).cast("array<float>"))
  }

  /** PQ codebooks: `m` per-subspace centroid tables, each trained with
    * the same deterministic stride-seeded decimal-mean Lloyd as the
    * IVF quantizer ([[ivfCentroids]]) on the subspace slice of the
    * L2-normalized vectors — bit-reproducible builds, no RNG. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int = 8, ksub: Int = 16,
                  refineSteps: Int = 1): Array[Array[(Int, Seq[Float])]] = {
    val normed = corpus
      .select(col(idCol), normalized(col(vecCol)).as(vecCol)).cache()
    try {
      val dim = normed.select(size(col(vecCol))).head().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
      val sub = dim / m
      Array.tabulate(m) { i =>
        ivfCentroids(normed.select(col(idCol),
          slice(col(vecCol), i * sub + 1, sub).as(vecCol)),
          idCol, vecCol, ksub, refineSteps)
      }
    } finally normed.unpersist()
  }

  /** Scan-local PQ encoding: one `m`-element code array per vector —
    * per subspace, the argmin codebook entry via the same O(ksub)
    * distance-array expression as the IVF assignment. No shuffle. */
  def withPqCodes(corpus: DataFrame, vecCol: String,
                  books: Array[Array[(Int, Seq[Float])]]): DataFrame = {
    val sub = books(0)(0)._2.length
    corpus
      .withColumn("__nv", normalized(col(vecCol)))
      .withColumn("pq_code", array(books.zipWithIndex.map { case (b, i) =>
        nearestCentroid(slice(col("__nv"), i * sub + 1, sub), b) }: _*))
      .drop("__nv")
  }

  /** Build (or reuse) the PQ index at `path`: the corpus with its
    * `pq_code` column plus a `.codebooks` sidecar (bit-identical to a
    * rebuild — spec-checked). The index is deliberately UNpartitioned:
    * an ADC scan touches every row but only the (id, code) COLUMNS, so
    * the layout question is columnar, not directory — parquet column
    * pruning is the scale lever here. */
  def ensurePqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    path: String, m: Int = 8, ksub: Int = 16)
      : (DataFrame, Array[Array[(Int, Seq[Float])]]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    if (!indexExists(corpus, path)) {
      val books = pqCodebooks(corpus, idCol, vecCol, m, ksub)
      books.zipWithIndex.flatMap { case (b, i) =>
        b.map { case (code, c) => (i, code, c) }
      }.toSeq.toDF("sub", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path + ".codebooks")
      withPqCodes(corpus, vecCol, books)
        .write.mode("overwrite").parquet(path)
    }
    val books = spark.read.parquet(path + ".codebooks")
      .as[(Int, Int, Seq[Float])].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_._2).map(r => (r._2, r._3)) }
      .map(_.toArray).toArray
    (spark.read.parquet(path), books)
  }

  /** ADC candidate scan: score every row from its codes against the
    * query's per-subspace distance tables (driver-computed, shipped as
    * m literal ksub-arrays — zero pre-probe Spark jobs, exactly like
    * [[probeBuckets]]), keep the `nCand` best. The plan is a
    * TakeOrderedAndProject over a scan whose ReadSchema has NO vector
    * column (spec-pinned) — the bytes win that makes PQ an index. */
  def pqCandidates(indexed: DataFrame, idCol: String,
                   query: Seq[Float],
                   books: Array[Array[(Int, Seq[Float])]],
                   nCand: Int): DataFrame = {
    val qn = {
      val n = math.sqrt(query.map(x => x.toDouble * x).sum)
      if (n == 0) query.map(_.toDouble) else query.map(_ / n)
    }
    val sub = books(0)(0)._2.length
    val score = books.zipWithIndex.map { case (b, i) =>
      val tbl = b.sortBy(_._1).map { case (_, c) =>
        c.zipWithIndex.map { case (x, j) =>
          val d = x - qn(i * sub + j); d * d }.sum }
      element_at(array(tbl.map(lit): _*), col("pq_code")(i) + 1)
    }.reduce(_ + _)
    indexed
      .select(col(idCol), score.as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(nCand)
  }

  /** PQ ANN top-k: ADC candidates re-ranked by exact cosine on the raw
    * vectors. The vector fetch is a broadcast semi-join of the tiny
    * candidate set against the index's (id, vector) columns — the scan
    * reads two columns and at 100 TB is further prunable by a runtime
    * bloom filter on the id key. Same output contract as the other ANN
    * entries: (id, cosine) at 4dp, (cosine desc, id) order. */
  def pqTopK(indexed: DataFrame, idCol: String, vecCol: String,
             query: Seq[Float], k: Int,
             books: Array[Array[(Int, Seq[Float])]],
             candFactor: Int = 8): DataFrame = {
    val cand = pqCandidates(indexed, idCol, query, books, k * candFactor)
    indexed.select(col(idCol), col(vecCol))
      .join(broadcast(cand.select(col(idCol))), idCol)
      .withColumn("cosine", cosine(col(vecCol), array(query.map(lit): _*)))
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** The `nProbe` inverted lists nearest to `query` — the shared
    * driver-side probe selection of [[ivfTopK]] and [[ivfPqTopK]]. */
  def ivfProbes(query: Seq[Float], centroids: Array[(Int, Seq[Float])],
                nProbe: Int): Seq[Int] = {
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    centroids.sortBy { case (i, c) => (d2(query, c), i) }
      .take(nProbe).map(_._1).toIndexedSeq
  }

  /** Build (or reuse) the composed IVF-PQ index at `path`: rows carry
    * BOTH an `ivf_list` (hive-partitioned — probes prune partitions)
    * and a `pq_code` (the candidate scan within probed lists reads
    * only the code column). Centroid and codebook sidecars as in the
    * component indexes. Rows × bytes: a probe touches ≈ nProbe/k of
    * the rows and ~1/30th of the bytes per row — the only layout of
    * the three families whose per-query IO stays sane when neither
    * pruning axis alone suffices. */
  def ensureIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                       path: String, kLists: Int = 16, m: Int = 8,
                       ksub: Int = 16)
      : (DataFrame, Array[(Int, Seq[Float])], Array[Array[(Int, Seq[Float])]]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    if (!indexExists(corpus, path)) {
      val cents = ivfCentroids(corpus, idCol, vecCol, kLists)
      cents.toSeq.toDF("ivf_list", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path + ".centroids")
      val books = pqCodebooks(corpus, idCol, vecCol, m, ksub)
      books.zipWithIndex.flatMap { case (b, i) =>
        b.map { case (code, c) => (i, code, c) }
      }.toSeq.toDF("sub", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path + ".codebooks")
      withIvfLists(withPqCodes(corpus, vecCol, books), vecCol, cents)
        .repartition(col("ivf_list"))
        .write.mode("overwrite").partitionBy("ivf_list").parquet(path)
    }
    val cents = spark.read.parquet(path + ".centroids")
      .as[(Int, Seq[Float])].collect().sortBy(_._1)
    val books = spark.read.parquet(path + ".codebooks")
      .as[(Int, Int, Seq[Float])].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(r => (r._2, r._3)) }
      .map(_.toArray).toArray
    (spark.read.parquet(path), cents, books)
  }

  /** IVF-PQ ANN top-k: partition-prune to the probed lists, ADC-score
    * the survivors from codes alone, exact-rerank the candidate set.
    * Both probe selections (lists AND distance tables) compute
    * driver-side — zero pre-probe Spark jobs. */
  def ivfPqTopK(indexed: DataFrame, idCol: String, vecCol: String,
                query: Seq[Float], k: Int,
                centroids: Array[(Int, Seq[Float])],
                books: Array[Array[(Int, Seq[Float])]],
                nProbe: Int = 4, candFactor: Int = 8): DataFrame = {
    val probes = ivfProbes(query, centroids, nProbe)
    val pruned = indexed.filter(col("ivf_list").isin(probes: _*))
    val cand = pqCandidates(pruned, idCol, query, books, k * candFactor)
    pruned.select(col(idCol), col(vecCol))
      .join(broadcast(cand.select(col(idCol))), idCol)
      .withColumn("cosine", cosine(col(vecCol), array(query.map(lit): _*)))
      .select(col(idCol), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
