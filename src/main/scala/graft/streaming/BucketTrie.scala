package graft.streaming

import org.apache.hadoop.fs.{FileUtil, Path}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Extendible-hashing bucket directory for the maintained indexes —
  * the answer to "`indexBuckets` is a static knob": at 100 TB nobody
  * re-tunes a bucket count by hand, so the count grows with the state.
  *
  * A store's partition id is no longer `hash mod N` for a frozen N;
  * it is the unique bucket of a prefix-free TRIE over the low bits of
  * the 64-bit key hash: bucket `(id, depth)` owns every hash `h` with
  * `h mod 2^depth == id`. Splitting bucket `(id, d)` produces
  * `(id, d+1)` and `(id + 2^d, d+1)` — rows split by bit `d` of their
  * hash, so ONLY that bucket's files are rewritten and every other
  * bucket (and its directory name) is untouched. The probe/append
  * side just computes the trie assignment instead of a fixed pmod;
  * touched-bucket pruning and the replay anti-joins are unchanged.
  *
  * The trie is stored as a `_buckets.json` sidecar inside each
  * [[IndexDirs]] version directory, written BEFORE the version's
  * `_SUCCESS`, so the map is atomic with the layout it describes; a
  * version without the sidecar (any pre-adaptive state dir) reads as
  * the initial uniform cover, which is exactly the layout such a
  * version was written under. The sidecar is bucket-count-sized and
  * driver-side — the same cost class as the touched-bucket hops.
  */
private[graft] object BucketTrie {

  /** Cap on any bucket's local depth: 2^22 buckets is far past any
    * state this engine maintains, and keeps the int ids unambiguous. */
  val MaxDepth = 22

  /** Default floor on a split's CHILD size: a bucket splits only when
    * both halves would still clear this, so the directory can never
    * split itself into the regime where per-file open/list constants
    * dominate fold cost (the r12 soak measured exactly that at
    * 10-25 KB bucket files: a 2.9× first-to-last-quartile fold-wall
    * drift from 16.7k tiny files, none of it probe volume). 4 MB
    * amortizes file constants to noise while staying 64× under the
    * production 256 MB split threshold. */
  val DefaultMinBucketBytes: Long = 4L << 20

  final case class Trie(depths: Map[Int, Int]) {
    def ids: Seq[Int] = depths.keys.toSeq.sorted
    def size: Int = depths.size

    /** Spark-side assignment: the bucket id of a 64-bit key-hash
      * column — ONE O(1) array lookup per row: `lut[h mod 2^maxDepth]`
      * where the precomputed table expands every bucket to its
      * aliases at the deepest level. (`element_at` on a MAP literal
      * is a LINEAR scan of ArrayBasedMapData — with thousands of
      * buckets × a lookup per distinct depth per row, the earlier
      * map-walk formulation measured 45 s compaction sweeps.) The
      * table is 4·2^maxDepth bytes driver-side — 16 MB at the
      * MaxDepth cap, int-array-literal-sized like a centroid set. */
    def bucketCol(h: Column): Column = {
      val maxD = depths.values.max
      val lut = new Array[Int](1 << maxD)
      depths.foreach { case (id, d) =>
        var alias = id
        while (alias < lut.length) { lut(alias) = id; alias += 1 << d }
      }
      element_at(typedLit(lut.toSeq),
        (pmod(h, lit(1L << maxD)) + 1L).cast("int"))
    }

    /** Split one bucket one level. Local by construction: no other
      * bucket's id, depth, or content changes. */
    def split(id: Int): Trie = {
      val d = depths(id)
      require(d < MaxDepth, s"bucket $id already at max depth $d")
      Trie(depths - id + (id -> (d + 1)) + ((id + (1 << d)) -> (d + 1)))
    }

    def json: String = depths.toSeq.sorted
      .map { case (id, d) => s""""$id": $d""" }
      .mkString("{", ", ", "}")
  }

  /** The uniform cover every state dir starts from (and the implied
    * map of versions written before adaptive bucketing). */
  def initial(n: Int): Trie = {
    require(n >= 1 && (n & (n - 1)) == 0,
      s"initial bucket count must be a power of two, got $n")
    val d = java.lang.Integer.numberOfTrailingZeros(n)
    Trie((0 until n).map(_ -> d).toMap)
  }

  val Sidecar = "_buckets.json"

  private val Pair = "\"(\\d+)\"\\s*:\\s*(\\d+)".r

  def fromJson(s: String): Trie =
    Trie(Pair.findAllMatchIn(s)
      .map(m => m.group(1).toInt -> m.group(2).toInt).toMap)

  /** The trie governing the newest live version of `indexPath` — what
    * appends, probes, and query-side pruning must compute with. */
  def load(spark: SparkSession, indexPath: String,
           initialBuckets: Int): Trie =
    IndexDirs.currentDir(spark, indexPath) match {
      case Some(dir) =>
        val f = IndexDirs.fs(spark, indexPath)
        val p = new Path(dir, Sidecar)
        if (f.exists(p)) {
          val in = f.open(p)
          try fromJson(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
          finally in.close()
        } else initial(initialBuckets)
      case None => initial(initialBuckets)
    }

  def write(spark: SparkSession, versionDir: String, trie: Trie): Unit = {
    val f = IndexDirs.fs(spark, versionDir)
    val out = f.create(new Path(versionDir, Sidecar), true)
    try out.write(trie.json.getBytes("UTF-8")) finally out.close()
  }

  /** True iff the newest live version holds hive-bucketed data
    * (`partCol=N` directories with data files) but NO `_buckets.json`
    * sidecar. Under the current code that state is unreachable —
    * bucket directories are created only by [[compactStore]], which
    * writes the sidecar before `_SUCCESS` — so it uniquely identifies
    * a store written by a PRE-adaptive code version, whose partition
    * function is unknown to the reader (it may not be `hash mod N` at
    * all). Maintainers whose pre-adaptive scheme differed from
    * hash-mod (e.g. the embedding-dedup bands store's old
    * `tk div span` layout) must refuse to probe such a store and
    * migrate it through [[compactStore]] first, which verifies the
    * inferred cover against the stored rows and force-rewrites on
    * mismatch. */
  def hasUnverifiedBucketedLayout(spark: SparkSession, indexPath: String,
                                  partCol: String): Boolean =
    IndexDirs.currentDir(spark, indexPath) match {
      case Some(dir) =>
        val f = IndexDirs.fs(spark, indexPath)
        if (f.exists(new Path(dir, Sidecar))) false
        else {
          val PartDir =
            s"^${java.util.regex.Pattern.quote(partCol)}=(\\d+)$$".r
          f.listStatus(new Path(dir)).exists(d =>
            d.isDirectory && PartDir.matches(d.getPath.getName))
        }
      case None => false
    }

  /** Selective compact-with-split of one hive-partitioned,
    * [[IndexDirs]]-versioned store with an [[IndexDirs.L0]] delta
    * zone — the LSM sweep all maintainers share:
    *
    *  1. the L0 delta files (per-batch appends since the last sweep)
    *     merge into their target buckets;
    *  2. every bucket whose data bytes exceed `splitBytes` splits one
    *     level (repeated sweeps converge — doubling per sweep tracks
    *     any ingest rate);
    *  3. splitting, fragmented (>1 file), or L0-receiving buckets are
    *     rewritten into one sorted run each, in ONE Spark job pruned
    *     to exactly those partitions;
    *  4. every other bucket is carried into the new version by raw
    *     file copy — no decode, no shuffle, no re-encode: the work a
    *     sweep does is proportional to what changed, not to the
    *     accumulated state.
    *
    * The new version becomes live only when its `_SUCCESS` lands
    * (after the data and the `_buckets.json` sidecar), and the
    * previous version is retained one generation — the same
    * crash/reader contract as the full rewrite this replaces. A crash
    * mid-sweep leaves an unmarked directory readers ignore.
    *
    * `keyHash` is the store's 64-bit key-hash expression over its OWN
    * columns (e.g. `xxhash64(band, key)`) — the same hash the append
    * side feeds [[Trie.bucketCol]].
    *
    * The governing trie is the version's sidecar; for a version
    * without one (pre-adaptive state, or no compact yet) it is
    * INFERRED from the stored ids as the uniform cover at
    * next-pow2(maxId+1). Sound regardless of the ORIGINAL modulus N:
    * every stored id satisfies `id = hash mod N < P ≤ N` with both
    * powers of two, so `hash mod P = id` too — the inferred cover
    * assigns every stored row to the directory it is already in. */
  def compactStore(spark: SparkSession, indexPath: String,
                   partCol: String, keyHash: Column,
                   sortCols: Seq[String], splitBytes: Long,
                   minBucketBytes: Long = DefaultMinBucketBytes): Unit = {
    val curOpt = IndexDirs.currentDir(spark, indexPath)
    if (curOpt.isEmpty) return
    val cur = curOpt.get
    val f = IndexDirs.fs(spark, indexPath)

    // per-bucket (bytes, files) from the directory listing — no scan
    val PartDir = s"^${java.util.regex.Pattern.quote(partCol)}=(\\d+)$$".r
    val bucketFiles: Map[Int, Seq[org.apache.hadoop.fs.FileStatus]] =
      f.listStatus(new Path(cur)).toSeq
        .filter(_.isDirectory)
        .flatMap(d => d.getPath.getName match {
          case PartDir(id) => Some(id.toInt ->
            f.listStatus(d.getPath).toSeq.filter(s =>
              s.isFile && !s.getPath.getName.startsWith("_") &&
                !s.getPath.getName.startsWith(".")))
          case _ => None
        }).toMap

    val l0 = IndexDirs.readL0(spark, cur)
    if (bucketFiles.isEmpty && l0.isEmpty) return

    val sidecarPath = new Path(cur, Sidecar)
    val hadSidecar = f.exists(sidecarPath)
    val trie0 =
      if (hadSidecar) {
        val in = f.open(sidecarPath)
        try fromJson(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
      } else {
        // no sidecar (pre-adaptive version, or L0-only before the
        // first sweep): infer the uniform cover from the stored ids —
        // sound when the original layout was `hash mod N` for a
        // power-of-two N, because every stored id < P ≤ N (both
        // powers of two) satisfies hash mod P = id exactly as it did
        // mod N. That premise is NOT checkable from the listing alone
        // (a pre-adaptive store may have used any partition function,
        // e.g. the old div-span bands layout), so it is VERIFIED
        // against the stored rows below and a mismatch forces a full
        // rewrite under the inferred cover instead of a raw copy.
        val maxStored = (bucketFiles.keys ++ l0.map(d =>
          d.agg(max(col(partCol))).head() match {
            case r if r.isNullAt(0) => 0
            case r => r.getInt(0)
          })).maxOption.getOrElse(0)
        var p = 1
        while (p <= maxStored && (p << 1) <= (1 << MaxDepth)) p <<= 1
        initial(p)
      }

    // One-time inference check (only a sidecar-less store with
    // bucketed data pays it, once per store lifetime): does every
    // stored row actually live in the bucket the inferred cover
    // assigns it? A clean pass certifies the hash-mod premise; any
    // mismatch means a legacy layout under a different partition
    // function — migrate by rewriting EVERY bucket under the inferred
    // trie rather than silently carrying mislabeled directories into
    // the new version (which would break probe pruning and the replay
    // anti-joins forever after).
    val legacyLayout = !hadSidecar && bucketFiles.nonEmpty && {
      !spark.read.parquet(cur)
        .filter(trie0.bucketCol(keyHash) =!= col(partCol))
        .isEmpty
    }

    // split decision sees the PENDING L0 volume too (attributed to
    // its pre-split bucket, bytes estimated from the L0 files' size ×
    // per-bucket row share), so a bucket filling through L0 splits in
    // THIS sweep, not one sweep late
    val l0BucketBytes: Map[Int, Long] = l0 match {
      case Some(d) =>
        val totalBytes = f.listStatus(new Path(cur, IndexDirs.L0)).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .map(_.getLen).sum
        val counts = d.select(trie0.bucketCol(keyHash).as("__pb"))
          .groupBy("__pb").count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val totalRows = math.max(1L, counts.values.sum)
        counts.map { case (id, n) => id -> totalBytes * n / totalRows }
      case None => Map.empty
    }
    // split only when both children would still clear the size floor
    // (bytes/2 ≥ minBucketBytes): bucket count can never outrun
    // file-size amortization, whatever splitBytes the caller tunes
    val splitIds = (bucketFiles.keySet ++ l0BucketBytes.keySet).filter {
      id =>
        val bytes = bucketFiles.get(id).map(_.map(_.getLen).sum)
          .getOrElse(0L) + l0BucketBytes.getOrElse(id, 0L)
        bytes > splitBytes && bytes >= 2L * minBucketBytes &&
          trie0.depths.getOrElse(id, MaxDepth) < MaxDepth
    }
    // A legacy migration sweep only relayouts (stored sizes say
    // nothing about the post-rehash distribution); splits resume on
    // the next sweep over the verified layout.
    val trie =
      if (legacyLayout) trie0
      else splitIds.foldLeft(trie0)((t, id) => t.split(id))
    // buckets receiving L0 rows, under the POST-split assignment
    // (driver hop, bounded by the bucket count)
    val l0Targets: Set[Int] = l0 match {
      case Some(d) => d.select(trie.bucketCol(keyHash).as("__pb"))
        .distinct().collect().map(_.getInt(0)).toSet
      case None => Set.empty
    }
    val rewriteIds =
      if (legacyLayout) bucketFiles.keySet
      else bucketFiles.collect { case (id, fs)
        if splitIds.contains(id) || fs.length > 1 ||
          l0Targets.contains(id) => id }.toSet
    // already one run per bucket, no pending L0, nothing over
    // threshold: the store is compact — no version churn. The
    // now-verified inference is stamped into the live version so
    // neither the verification scan nor the inference ever reruns.
    if (rewriteIds.isEmpty && l0.isEmpty) {
      if (!hadSidecar) write(spark, cur, trie)
      return
    }

    val next = IndexDirs.nextDir(spark, indexPath)
    f.mkdirs(new Path(next))

    if (rewriteIds.nonEmpty || l0.nonEmpty) {
      // one pruned job over exactly the rewritten buckets plus the L0
      // delta, re-assigned under the post-split trie (non-split
      // buckets keep their id). Buckets that newly appear from a
      // split of an L0-target land here too — their parent is in
      // rewriteIds, so no row is lost to the copy path.
      val stage = s"$next/_stage"
      val bucketedSrc =
        if (rewriteIds.nonEmpty)
          Some(spark.read.parquet(cur)
            .filter(col(partCol).isin(rewriteIds.toSeq.sorted: _*)))
        else None
      val src = (bucketedSrc, l0) match {
        case (Some(b), Some(d)) => b.unionByName(d)
        case (b, d) => b.orElse(d).get
      }
      src.withColumn(partCol, trie.bucketCol(keyHash))
        .repartition(col(partCol))
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("overwrite").partitionBy(partCol).parquet(stage)
      f.listStatus(new Path(stage)).toSeq.map(_.getPath)
        .filter(p => PartDir.matches(p.getName))
        .foreach(p => f.rename(p, new Path(next, p.getName)))
      f.delete(new Path(stage), true)
    }

    val conf = spark.sessionState.newHadoopConf()
    bucketFiles.foreach { case (id, files) =>
      if (!rewriteIds.contains(id) && files.nonEmpty) {
        val dst = new Path(next, s"$partCol=$id")
        f.mkdirs(dst)
        files.foreach(s => FileUtil.copy(f, s.getPath, f,
          new Path(dst, s.getPath.getName), false, conf))
      }
    }

    write(spark, next, trie)
    f.create(new Path(next, "_SUCCESS")).close()
    IndexDirs.retire(spark, indexPath)
  }
}
