package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BucketTrie, IncrementalNearDup, IndexDirs}

/** Adaptive bucket directory ([[BucketTrie]]): the extendible-hashing
  * trie that replaces the static `indexBuckets` knob. Unit properties
  * of the trie itself, then the end-to-end contract on the near-dup
  * maintainer: splits triggered by a size threshold grow the bucket
  * count, keep the state EXACTLY equivalent, keep the probe
  * partition-pruned, and later appends/probes agree with the split
  * layout. */
class BucketTrieSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Reference assignment: the unique (id, depth) with
    * h mod 2^depth == id — what bucketCol must compute. */
  private def assignRef(depths: Map[Int, Int], h: Long): Int = {
    val hits = depths.filter { case (id, d) =>
      ((h % (1L << d)) + (1L << d)) % (1L << d) == id }
    assert(hits.size == 1, s"cover not prefix-free at $h: $hits")
    hits.head._1
  }

  test("initial cover, split locality, and prefix-freeness") {
    val t0 = BucketTrie.initial(8)
    assert(t0.ids == (0 until 8) && t0.depths.values.forall(_ == 3))
    val t1 = t0.split(5) // -> (5,4) and (13,4)
    assert(t1.depths(5) == 4 && t1.depths(13) == 4)
    assert((t1.depths - 5 - 13) == (t0.depths - 5), "split was not local")
    // still a cover: every hash lands in exactly one bucket
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ => assignRef(t1.depths, rnd.nextLong()); () }
    // re-splitting a child keeps going
    val t2 = t1.split(13) // -> (13,5) and (29,5)
    assert(t2.depths(13) == 5 && t2.depths(29) == 5)
    (1 to 2000).foreach { _ => assignRef(t2.depths, rnd.nextLong()); () }
    intercept[IllegalArgumentException](BucketTrie.initial(12))
  }

  test("bucketCol matches the reference assignment on random hashes") {
    import spark.implicits._
    val trie = BucketTrie.initial(16).split(3).split(19).split(0)
    val hs = Seq.fill(3000)(scala.util.Random.nextLong()) :+ 0L :+ -1L :+
      Long.MinValue :+ Long.MaxValue
    val got = hs.toDF("h")
      .select(col("h"), trie.bucketCol(col("h")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    got.foreach { case (h, b) =>
      assert(b == assignRef(trie.depths, h), s"hash $h") }
  }

  test("json round-trip") {
    val t = BucketTrie.initial(4).split(2).split(1)
    assert(BucketTrie.fromJson(t.json).depths == t.depths)
  }

  test("near-dup compact splits over-threshold buckets; state, probe " +
      "pruning, and later maintenance are unchanged") {
    import spark.implicits._
    val p = IncrementalNearDup.Params(indexBuckets = 4)
    val statePath = Files.createTempDirectory("graft-trie-split").toString
    def docText(id: Long): String = {
      val g = id / 3
      val base = (0 until 20).map(j => s"g${g}t$j").mkString(" ")
      if (id % 3 == 0) base else s"$base m$id"
    }
    def batch(b: Int, n: Int) = (0 until n)
      .map { i => val id = b.toLong * n + i; (id, docText(id)) }
      .toDF("doc_id", "text")
    (0 until 4).foreach(b => IncrementalNearDup.processBatch(
      batch(b, 120), "doc_id", "text", statePath, p))

    def clusterMap() = {
      val all = (0 until 4 * 120).map(i => (i.toLong, docText(i)))
        .toDF("doc_id", "text")
      IncrementalNearDup.clusters(all, "doc_id", statePath)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    def liveBuckets(): Seq[Int] = {
      val dir = IndexDirs.currentDir(spark, s"$statePath/index").get
      new java.io.File(dir).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("pb="))
        .map(_.getName.stripPrefix("pb=").toInt).sorted
    }

    val before = clusterMap()
    val rowsBefore = IncrementalNearDup
      .bandIndex(spark, statePath).get.count()
    assert(liveBuckets().forall(_ < 4))

    // threshold of 1 byte, size floor disabled: every bucket splits
    IncrementalNearDup.compact(spark, statePath, splitBytes = 1L,
      minBucketBytes = 0L)
    val split1 = liveBuckets()
    assert(split1.exists(_ >= 4), s"no bucket split: $split1")
    val trie1 = BucketTrie.load(spark, s"$statePath/index", p.indexBuckets)
    assert(trie1.size > 4, s"trie did not grow: ${trie1.depths}")
    assert(IncrementalNearDup.bandIndex(spark, statePath).get.count()
      == rowsBefore, "split changed index content")
    assert(clusterMap() == before, "split changed clusters")

    // appends after the split land under the live trie, and the fold
    // keeps finding cross-batch near-dups (doc 1201 dups group 400 =
    // docs 1200/1202 of batch 10 below AND nothing merges wrongly)
    IncrementalNearDup.processBatch(batch(10, 120), "doc_id", "text",
      statePath, p)
    val all5 = ((0 until 4 * 120).map(_.toLong) ++
      (1200 until 1320).map(_.toLong)).map(i => (i, docText(i)))
      .toDF("doc_id", "text")
    val got = IncrementalNearDup.clusters(all5, "doc_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1201L) == got(1200L) && got(1202L) == got(1200L),
      "post-split fold missed an in-batch dup group")
    assert(got(1L) == before(1L), "post-split fold rewrote old labels")

    // probe stays partition-pruned under the split layout
    val delta = Seq((999999L, docText(1200))).toDF("doc_id", "text")
    val touched = IncrementalNearDup
      .bandRows(delta, "doc_id", "text", p, statePath)
      .select("pb").distinct().collect().map(_.getInt(0)).toIndexedSeq
    val pruned = IncrementalNearDup.prunedIndex(
      IncrementalNearDup.bandIndex(spark, statePath).get, touched)
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.head.metadata("PartitionFilters").contains("pb"),
      "probe lost partition pruning after the split")

    // a sweep with nothing fragmented and nothing over a huge
    // threshold is a no-op (no version churn)
    IncrementalNearDup.compact(spark, statePath, splitBytes = Long.MaxValue)
    val v1 = IndexDirs.currentDir(spark, s"$statePath/index").get
    IncrementalNearDup.compact(spark, statePath, splitBytes = Long.MaxValue)
    assert(IndexDirs.currentDir(spark, s"$statePath/index").get == v1,
      "no-op sweep still rewrote a version")
  }

  /** Hand-build a live version dir: hive `pk=` partitions from the
    * given assignment column, `_SUCCESS`, NO sidecar — the shape of a
    * pre-adaptive store. */
  private def writeLegacyStore(path: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    df.repartition(1).write.partitionBy("pk").parquet(s"$path/v0")
    // partitionBy's own _SUCCESS lands at the version root already;
    // ensure it exists either way (the liveness marker)
    val f = new java.io.File(s"$path/v0/_SUCCESS")
    if (!f.exists()) { f.createNewFile(); () }
    val side = new java.io.File(s"$path/v0/${BucketTrie.Sidecar}")
    if (side.exists()) { side.delete(); () }
  }

  test("compactStore detects a legacy (non-hash-mod) layout and " +
      "force-migrates it instead of copying mislabeled buckets") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-trie-legacy").toString + "/idx"
    // div-span layout: pk = tk / 16 — NOT the hash-mod cover the
    // sidecar-less inference assumes
    val rows = (0L until 64L).map(tk => (tk, s"p$tk")).toDF("tk", "v")
      .withColumn("pk", (col("tk") / 16).cast("int"))
    writeLegacyStore(path, rows)
    assert(BucketTrie.hasUnverifiedBucketedLayout(spark, path, "pk"),
      "legacy store not flagged as unverified")

    BucketTrie.compactStore(spark, path, "pk", xxhash64(col("tk")),
      Seq("tk"), splitBytes = Long.MaxValue)

    val dir = IndexDirs.currentDir(spark, path).get
    assert(dir.endsWith("v1"), s"migration did not write a new version: $dir")
    assert(!BucketTrie.hasUnverifiedBucketedLayout(spark, path, "pk"))
    val trie = BucketTrie.load(spark, path, 4)
    val got = spark.read.parquet(dir)
      .select(col("tk"), col("v"), col("pk"),
        trie.bucketCol(xxhash64(col("tk"))).as("want"))
      .collect()
    assert(got.length == 64, "migration lost or duplicated rows")
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq.sorted ==
      (0L until 64L).map(tk => (tk, s"p$tk")).sorted)
    got.foreach(r => assert(r.getInt(2) == r.getInt(3),
      s"row tk=${r.getLong(0)} stored in pk=${r.getInt(2)} " +
        s"but hashes to ${r.getInt(3)}"))
  }

  test("compactStore verifies a sidecar-less hash-mod store and stamps " +
      "the sidecar without version churn") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-trie-stamp").toString + "/idx"
    val rows = (0L until 64L).map(tk => (tk, s"p$tk")).toDF("tk", "v")
      .withColumn("pk", pmod(xxhash64(col("tk")), lit(4L)).cast("int"))
    writeLegacyStore(path, rows)
    val v0 = IndexDirs.currentDir(spark, path).get
    BucketTrie.compactStore(spark, path, "pk", xxhash64(col("tk")),
      Seq("tk"), splitBytes = Long.MaxValue)
    assert(IndexDirs.currentDir(spark, path).get == v0,
      "verified no-op sweep still rewrote a version")
    assert(new java.io.File(s"$v0/${BucketTrie.Sidecar}").exists(),
      "verified inference was not stamped")
    assert(BucketTrie.load(spark, path, 4).depths ==
      BucketTrie.initial(4).depths)
  }

  test("split size floor: an over-threshold bucket whose children " +
      "would undershoot minBucketBytes does not split") {
    import spark.implicits._
    val p = IncrementalNearDup.Params(indexBuckets = 4)
    val statePath = Files.createTempDirectory("graft-trie-floor").toString
    def docText(id: Long): String = {
      val g = id / 3
      val base = (0 until 20).map(j => s"g${g}t$j").mkString(" ")
      if (id % 3 == 0) base else s"$base m$id"
    }
    (0 until 2).foreach(b => IncrementalNearDup.processBatch(
      (0 until 120).map { i =>
        val id = b.toLong * 120 + i; (id, docText(id)) }
        .toDF("doc_id", "text"),
      "doc_id", "text", statePath, p))
    // over-threshold everywhere (1 byte), but the default 4 MB child
    // floor gates every split at this toy size: layout must stay the
    // initial 4-bucket cover — the system can never split itself into
    // the per-file-constant regime
    IncrementalNearDup.compact(spark, statePath, splitBytes = 1L)
    val trie = BucketTrie.load(spark, s"$statePath/index", p.indexBuckets)
    assert(trie.depths == BucketTrie.initial(4).depths,
      s"floored sweep still split: ${trie.depths}")
  }

  test("retireAged keeps the superseded version inside the grace " +
      "window and retires it after") {
    import spark.implicits._
    val p = IncrementalNearDup.Params(indexBuckets = 4)
    val statePath = Files.createTempDirectory("graft-trie-retire").toString
    def docs(b: Int) = (0 until 60).map { i =>
      val id = b.toLong * 60 + i; (id, s"tok${id % 7} u$id w${id % 5}") }
      .toDF("doc_id", "text")
    (0 until 2).foreach(b => IncrementalNearDup.processBatch(
      docs(b), "doc_id", "text", statePath, p))
    IncrementalNearDup.compact(spark, statePath) // v0 -> v1
    IncrementalNearDup.processBatch(docs(2), "doc_id", "text", statePath, p)
    IncrementalNearDup.compact(spark, statePath) // v1 -> v2
    def nVersions: Int = new java.io.File(s"$statePath/index")
      .listFiles().count(f => f.isDirectory && f.getName.startsWith("v"))
    assert(nVersions >= 2, s"expected >=2 versions, got $nVersions")
    // inside the grace window: keep=2 semantics
    IncrementalNearDup.vacuum(spark, statePath,
      readerGraceMs = Some(60L * 60 * 1000))
    assert(nVersions == 2, "grace window did not preserve the " +
      "superseded generation")
    // grace elapsed (0 ms): superseded generation retires (keep=1)
    IncrementalNearDup.vacuum(spark, statePath, readerGraceMs = Some(0L))
    assert(nVersions == 1, "aged retirement did not drop to keep=1")
    // the store still reads fine afterwards
    assert(IncrementalNearDup.bandIndex(spark, statePath).get.count() > 0)
  }

  test("embedding-dedup refuses to probe an unverified bucketed store") {
    import spark.implicits._
    val state = Files.createTempDirectory("graft-embdedup-legacy").toString
    val rows = (0L until 8L).map(tk => (tk, tk, s"x"))
      .toDF("__id", "tk", "v")
      .withColumn("pk", (col("tk") / 2).cast("int"))
    writeLegacyStore(s"$state/bands", rows.select("__id", "tk", "pk"))
    val vecs = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.IncrementalEmbeddingDedup.processBatch(
        vecs, "vec_id", "embedding", state)
    }
    assert(e.getMessage.contains("pre-adaptive"), e.getMessage)
  }
}
