package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, Dedup}
import graft.similarity.Similarity
import graft.streaming.{IncrementalBm25, IncrementalEmbeddingDedup,
  IncrementalNearDup}
import graft.text.Retrieval

/** Sustained-ingest soak for the maintained indexes — the week-long-
  * stream claim, measured. Drives ≥ 200 micro-batches through the
  * three flagship maintainers (near-dup, BM25, embedding-dedup) with
  * `compact()` + `vacuum()` interleaved every N batches, and reports:
  *
  *  - per-batch fold wall, quartile-averaged (flat ⇒ Δ-bounded work —
  *    per-batch cost must not grow with accumulated state);
  *  - state directory size and FILE COUNT after each maintenance
  *    sweep (bytes grow linearly with the corpus by design; the file
  *    count is what compaction must hold flat — an LSM layout that
  *    leaks one file per batch per bucket dies on a week-long run);
  *  - end-state equivalence against the one-shot batch recompute over
  *    the full accumulated corpus (the same assertion the specs make
  *    at toy scale, here after 200 folds + 8 compactions).
  *
  * Corpora are deterministic id-derived synthetics with planted
  * duplicates (near-dup: groups of 3 at jaccard ≥ 0.9; embeddings:
  * identical pairs among ±1 vectors that are near-orthogonal across
  * groups), so the expected cluster structure is known and the
  * one-shot reference is exact.
  *
  * Usage: runMain graft.tools.SoakBench [which] [nBatches] [batchSize]
  *        [compactEvery] [splitKB] [minBucketKB] [graceSec]
  *        — which ∈ neardup|bm25|embdedup|all; splitKB is the
  *        per-bucket split threshold for the adaptive sweeps
  *        ([[graft.streaming.BucketTrie]]), scaled down from the
  *        256 MB production default so splits actually fire at soak
  *        scale (0 = never split, the fixed-bucket baseline).
  */
object SoakBench {

  private def dirStats(path: String): (Long, Long) = {
    val root = Paths.get(path)
    if (!Files.exists(root)) return (0L, 0L)
    val s = Files.walk(root)
    try {
      var bytes = 0L; var files = 0L
      s.iterator().asScala.foreach { p =>
        if (Files.isRegularFile(p)) { bytes += Files.size(p); files += 1 }
      }
      (bytes, files)
    } finally s.close()
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Per-batch walls → (first-quartile avg, last-quartile avg); batch 0
    * is excluded as JIT/plan warmup. Below 8 batches the warmup-excluded
    * quartiles would be empty or overlapping, so fall back to whole-
    * series averages (ratio 1.0 territory — drift is not measurable
    * at that length anyway). */
  private def flatness(walls: Seq[Double]): (Double, Double) = {
    if (walls.length < 8) {
      val avg = walls.sum / walls.length
      (avg, avg)
    } else {
      val q = walls.length / 4
      (walls.slice(1, 1 + q).sum / q, walls.takeRight(q).sum / q)
    }
  }

  private def report(tag: String, walls: Seq[Double],
                     compactWalls: Seq[Double],
                     sizes: Seq[(Int, Long, Long)], ok: Boolean): Unit = {
    val (fq, lq) = flatness(walls)
    println(f"[$tag] batches=${walls.length} fold wall: first-quartile " +
      f"avg $fq%.2f s, last-quartile avg $lq%.2f s (ratio ${lq / fq}%.2f)")
    if (compactWalls.nonEmpty)
      println(f"[$tag] compact+vacuum sweeps: ${compactWalls.length}, " +
        f"avg ${compactWalls.sum / compactWalls.length}%.2f s, " +
        f"max ${compactWalls.max}%.2f s")
    sizes.foreach { case (b, bytes, files) =>
      println(f"[$tag] after batch $b%3d: state ${bytes / 1e6}%8.1f MB " +
        f"in $files%5d files")
    }
    println(s"[$tag] one-shot equivalence: ${if (ok) "PASS" else "FAIL"}")
    require(ok, s"$tag soak end-state diverged from the one-shot recompute")
  }

  // ---- corpora ------------------------------------------------------

  /** Groups of 3 near-identical docs: 20 shared group tokens plus one
    * per-doc mutation token for two of the three members — pairwise
    * jaccard 20/21 and 20/22, both ≥ 0.7; zero overlap across groups. */
  private def dedupText(id: Long): String = {
    val g = id / 3; val mut = id % 3
    val base = (0 until 20).map(j => s"g${g}t$j").mkString(" ")
    if (mut == 0) base else s"$base m$id"
  }

  /** Query-term plant over a varying-length filler vocabulary. */
  private def bm25Text(id: Long): String = {
    val terms = Seq(
      if (id % 3 == 0) "hash" else null, if (id % 5 == 0) "join" else null,
      if (id % 7 == 0) "sort" else null, if (id % 11 == 0) "merge" else null
    ).filter(_ != null)
    val fill = (0 until (12 + (id % 5)).toInt)
      .map(j => s"f${(id * 13 + j * 7) % 1000}")
    (terms ++ fill).mkString(" ")
  }

  /** ±1 vectors in 64 dims from a per-group LCG: members of a pair are
    * identical (cosine 1); cross-group cosines concentrate at 0 with
    * std 1/8, so nothing accidental crosses the 0.9 threshold. */
  private def embVec(id: Long, dim: Int = 64): Seq[Float] = {
    val g = id / 2
    var x = g * 6364136223846793005L + 1442695040888963407L
    Seq.tabulate(dim) { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      if (((x >>> 32) & 1L) == 0L) 1.0f else -1.0f
    }
  }

  // ---- the three soaks ----------------------------------------------

  def soakNearDup(spark: SparkSession, nBatches: Int, batchSize: Int,
                  compactEvery: Int, splitBytes: Long,
                  minBucketBytes: Long, graceMs: Option[Long]): Unit = {
    import spark.implicits._
    val p = IncrementalNearDup.Params()
    val statePath = Files.createTempDirectory("graft-soak-neardup").toString
    def batch(b: Int) = (0 until batchSize)
      .map { i => val id = b.toLong * batchSize + i; (id, dedupText(id)) }
      .toDF("doc_id", "text")

    val compactWalls = Seq.newBuilder[Double]
    val sizes = Seq.newBuilder[(Int, Long, Long)]
    val walls = (0 until nBatches).map { b =>
      val (_, w) = time(IncrementalNearDup.processBatch(
        batch(b), "doc_id", "text", statePath, p))
      if ((b + 1) % compactEvery == 0) {
        val (_, cw) = time {
          IncrementalNearDup.compact(spark, statePath, splitBytes,
            minBucketBytes)
          IncrementalNearDup.vacuum(spark, statePath,
            readerGraceMs = graceMs)
        }
        compactWalls += cw
        val (bytes, files) = dirStats(statePath)
        sizes += ((b, bytes, files))
        println(f"[neardup] batch $b%3d: fold $w%.2f s, sweep $cw%.2f s, " +
          f"state ${bytes / 1e6}%.1f MB / $files files")
      }
      w
    }

    val all = spark.range(nBatches.toLong * batchSize)
      .select(col("id").as("doc_id"),
        udf(dedupText _).apply(col("id")).as("text"))
    val (ok, ew) = time {
      val pairs = Dedup.nearDuplicates(all, "doc_id", "text",
        p.shingleLen, p.numHashes, p.numBands, p.threshold, p.maxBucket)
      val ref = ConnectedComponents.dupClusters(all, "doc_id",
          pairs.select("a", "b"), "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = IncrementalNearDup.clusters(all, "doc_id", statePath)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // vacuousness guard: cross-group merges are impossible (disjoint
      // vocabularies) so clusters ≥ n/3 always; banding misses a ~0.9-
      // jaccard pair a few % of the time (identically in both paths),
      // so allow a small fraction of split groups
      val n = nBatches.toLong * batchSize
      val nc = ref.values.toSet.size
      if (got != ref) println(s"[neardup] DIVERGED: ${
        got.count { case (k, v) => ref.get(k) != Some(v) }} of ${
        got.size} labels differ")
      got == ref && nc >= n / 3 && nc <= n / 3 + n / 20
    }
    println(f"[neardup] one-shot recompute + compare over ${
      nBatches * batchSize} docs: $ew%.1f s")
    report("neardup", walls, compactWalls.result(), sizes.result(), ok)
  }

  def soakBm25(spark: SparkSession, nBatches: Int, batchSize: Int,
               compactEvery: Int, splitBytes: Long,
               minBucketBytes: Long, graceMs: Option[Long]): Unit = {
    import spark.implicits._
    val terms = Seq("hash", "join", "sort", "merge")
    val statePath = Files.createTempDirectory("graft-soak-bm25").toString
    def batch(b: Int) = (0 until batchSize)
      .map { i => val id = b.toLong * batchSize + i; (id, bm25Text(id)) }
      .toDF("doc_id", "text")
    def rowsOf(df: DataFrame) =
      df.select("doc_id", "bm25", "n_matched_terms")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSeq

    val compactWalls = Seq.newBuilder[Double]
    val sizes = Seq.newBuilder[(Int, Long, Long)]
    val walls = (0 until nBatches).map { b =>
      val (_, w) = time(IncrementalBm25.processBatch(
        batch(b), "doc_id", "text", statePath))
      if ((b + 1) % compactEvery == 0) {
        val (_, cw) = time {
          IncrementalBm25.compact(spark, statePath, splitBytes,
            minBucketBytes)
          IncrementalBm25.vacuum(spark, statePath, readerGraceMs = graceMs)
        }
        compactWalls += cw
        val (bytes, files) = dirStats(statePath)
        sizes += ((b, bytes, files))
        println(f"[bm25] batch $b%3d: fold $w%.2f s, sweep $cw%.2f s, " +
          f"state ${bytes / 1e6}%.1f MB / $files files")
      }
      w
    }

    // probe wall must be corpus-size-independent-ish: measure it too
    val (streaming, qw) = time(rowsOf(
      IncrementalBm25.bm25TopK(spark, statePath, terms, 20).get))
    val all = spark.range(nBatches.toLong * batchSize)
      .select(col("id").as("doc_id"),
        udf(bm25Text _).apply(col("id")).as("text"))
    val (oneShot, ew) = time(rowsOf(
      Retrieval.bm25TopK(all, "doc_id", "text", terms, 20)))
    println(f"[bm25] maintained-index probe: $qw%.2f s; one-shot over ${
      nBatches * batchSize} docs: $ew%.1f s")
    report("bm25", walls, compactWalls.result(), sizes.result(),
      streaming == oneShot && streaming.exists(_._2 > 0))
  }

  def soakEmbDedup(spark: SparkSession, nBatches: Int, batchSize: Int,
                   compactEvery: Int, splitBytes: Long,
                   minBucketBytes: Long, graceMs: Option[Long]): Unit = {
    import spark.implicits._
    // Key space sized to the corpus the soak accumulates (the standard
    // LSH deployment rule: 2^planes ≳ corpus / target bucket size —
    // planes grow with log(n) exactly like IVF's nlist). At the old
    // 8-plane/4-table geometry the whole run shares 1,024 distinct
    // keys, every vector collides with a constant FRACTION of the
    // accumulated corpus, and per-fold candidate volume grows
    // linearly by construction — a key-space saturation stress, not
    // an operating point (the one-shot batch pipeline pays the same
    // term, so equivalence holds either way). Planted duplicates are
    // IDENTICAL vectors, which share home keys at any plane count, so
    // recall is unaffected by the sizing.
    val p = IncrementalEmbeddingDedup.Params(
      threshold = 0.9, numPlanes = 14, tables = 4, seed = 42L,
      maxBucket = 4000, indexBuckets = 64)
    val statePath = Files.createTempDirectory("graft-soak-emb").toString
    def batch(b: Int) = (0 until batchSize)
      .map { i => val id = b.toLong * batchSize + i; (id, embVec(id)) }
      .toDF("vec_id", "embedding")

    val compactWalls = Seq.newBuilder[Double]
    val sizes = Seq.newBuilder[(Int, Long, Long)]
    val walls = (0 until nBatches).map { b =>
      val (_, w) = time(IncrementalEmbeddingDedup.processBatch(
        batch(b), "vec_id", "embedding", statePath, p))
      if ((b + 1) % compactEvery == 0) {
        val (_, cw) = time {
          IncrementalEmbeddingDedup.compact(spark, statePath, splitBytes,
            minBucketBytes)
          IncrementalEmbeddingDedup.vacuum(spark, statePath,
            readerGraceMs = graceMs)
        }
        compactWalls += cw
        val (bytes, files) = dirStats(statePath)
        sizes += ((b, bytes, files))
        println(f"[embdedup] batch $b%3d: fold $w%.2f s, sweep $cw%.2f s, " +
          f"state ${bytes / 1e6}%.1f MB / $files files")
      }
      w
    }

    val n = nBatches.toLong * batchSize
    val all = spark.range(n)
      .select(col("id").as("vec_id"),
        udf((id: Long) => embVec(id)).apply(col("id")).as("embedding"))
    val (ok, ew) = time {
      val pairs = Similarity.cosineNearDuplicatesMulti(
        all, "vec_id", "embedding", p.threshold, p.numPlanes, p.tables,
        p.seed, p.maxBucket)
      val ref = ConnectedComponents.dupClusters(all.select("vec_id"),
          "vec_id", pairs.select(col("a"), col("b")), "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = IncrementalEmbeddingDedup.clusters(
          all.select("vec_id"), "vec_id", statePath)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      got == ref && ref.values.toSet.size == n / 2
    }
    println(f"[embdedup] one-shot recompute + compare over $n vecs: $ew%.1f s")
    report("embdedup", walls, compactWalls.result(), sizes.result(), ok)
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(200)
    val batchSize = args.lift(2).map(_.toInt).getOrElse(500)
    val compactEvery = args.lift(3).map(_.toInt).getOrElse(25)
    val splitBytes = args.lift(4).map(_.toLong * 1024)
      .filter(_ > 0).getOrElse(Long.MaxValue)
    // split-child size floor: -1 = production default (4 MB);
    // 0 disables the floor (the pre-r13 limits-probe geometry)
    val minBucketBytes = args.lift(5).map(_.toLong) match {
      case Some(v) if v >= 0 => v * 1024
      case _ => graft.streaming.BucketTrie.DefaultMinBucketBytes
    }
    // reader-grace for keep=1 version retirement; negative/absent =
    // the legacy fixed keep=2
    val graceMs = args.lift(6).map(_.toLong).filter(_ >= 0)
      .map(_ * 1000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      // Long-lived-driver hygiene (what a production streaming driver
      // sets): the in-memory status store retains execution/task
      // wrappers even with the UI off (measured: 1.6M SQLPlanMetric
      // objects after ~500 folds), and ContextCleaner only reclaims
      // dead broadcasts/checkpoints when a driver GC happens — with a
      // 32 GB heap that can be never. Cap the store and force the
      // cleaner's periodic GC down from its 30 min default.
      .config("spark.sql.ui.retainedExecutions", "50")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.cleaner.periodicGC.interval", "3min")
      // an embdedup fold spans ~120 codegen stages; the 100-entry
      // default Janino cache thrashes, so EVERY fold re-compiles and
      // re-loads every generated class and the JIT never converges
      // (measured: compile-id 119k and still climbing at batch 130,
      // fold CPU doubling while state stayed at 6 MB)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (which == "neardup" || which == "all")
      soakNearDup(spark, nBatches, batchSize, compactEvery, splitBytes,
        minBucketBytes, graceMs)
    if (which == "bm25" || which == "all")
      soakBm25(spark, nBatches, batchSize, compactEvery, splitBytes,
        minBucketBytes, graceMs)
    if (which == "embdedup" || which == "all")
      soakEmbDedup(spark, nBatches, math.max(1, batchSize / 2), compactEvery,
        splitBytes, minBucketBytes, graceMs)
    spark.stop()
  }
}
