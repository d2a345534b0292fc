package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Similarity
import graft.sources.TestData
import graft.streaming.IncrementalAnnIndex

/** Streaming ≡ batch for ANN-index maintenance: vectors arriving in
  * micro-batches fold into the persisted multi-table LSH index, and a
  * probe of the maintained index returns exactly what a one-shot
  * [[Similarity.ensureLshIndexMulti]] + annTopKMulti over the same
  * corpus returns — while each batch's work stays Δ-sized and the
  * probe stays a pruned read. */
class StreamingAnnSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val P = IncrementalAnnIndex.Params()

  private def corpusAndQuery() = {
    val emb = TestData.table(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    (emb.filter(col("vec_id") =!= 0).select("vec_id", "embedding"), q)
  }

  private def batchReference(corpus: org.apache.spark.sql.DataFrame,
                             q: Seq[Float]) = {
    val dir = Files.createTempDirectory("graft-ann-ref").toString
    val idx = Similarity.ensureLshIndexMulti(corpus, "embedding",
      s"$dir/lsh", P.numPlanes, P.tables, P.seed)
    Similarity.annTopKMulti(idx, "vec_id", "embedding", q, 10,
      P.numPlanes, P.tables, P.seed)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("streaming micro-batches converge to the one-shot batch index probe") {
    val (corpus, q) = corpusAndQuery()
    val statePath = Files.createTempDirectory("graft-incann-s").toString
    val ref = batchReference(corpus, q)

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val sqry = IncrementalAnnIndex.attach(
      stream.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
      statePath, P,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    val all = corpus.as[(Long, Seq[Float])].collect().sortBy(_._1)
    all.grouped(math.max(1, all.length / 4)).foreach { b =>
      stream.addData(b.toIndexedSeq)
      sqry.processAllAvailable()
    }
    sqry.stop()

    val got = IncrementalAnnIndex.annTopK(spark, statePath,
        "vec_id", "embedding", q, 10, P)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == ref)

    // the maintained index holds exactly corpus × tables rows
    val idx = IncrementalAnnIndex.index(spark, statePath).get
    assert(idx.count() == all.length.toLong * P.tables)
  }

  test("replayed batches are idempotent; compaction preserves content and results") {
    val (corpus, q) = corpusAndQuery()
    val statePath = Files.createTempDirectory("graft-incann-b").toString
    val ref = batchReference(corpus, q)

    val parts = corpus.as[(Long, Seq[Float])].collect().sortBy(_._1)
      .grouped(150).map(_.toSeq.toDF("vec_id", "embedding")).toSeq
    IncrementalAnnIndex.processBatch(parts(0), "vec_id", "embedding",
      statePath, P)
    // simulate a foreachBatch retry: the same batch replays in full
    IncrementalAnnIndex.processBatch(parts(0), "vec_id", "embedding",
      statePath, P)
    parts.drop(1).foreach(b =>
      IncrementalAnnIndex.processBatch(b, "vec_id", "embedding", statePath, P))

    val idx = IncrementalAnnIndex.index(spark, statePath).get
    val n = corpus.count()
    assert(idx.count() == n * P.tables, "replay duplicated index rows")

    val before = IncrementalAnnIndex.annTopK(spark, statePath,
        "vec_id", "embedding", q, 10, P)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(before == ref)

    // compaction: one sorted run per directory inside the NEW live
    // version, identical content. The file count a READER sees (the
    // newest live version's listing) must shrink; the previous version
    // dir is retained one generation for in-flight readers
    // (IndexDirs.retire keep=2), so the TOTAL on-disk count may grow.
    def liveDir(): java.io.File = new java.io.File(
      graft.streaming.IndexDirs.currentDir(spark, s"$statePath/index").get)
    def fileCount(dir: java.io.File): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(dir).count(_.getName.endsWith(".parquet"))
    }
    val dirBefore = liveDir()
    val filesBefore = fileCount(dirBefore)
    IncrementalAnnIndex.compact(spark, statePath, P)
    val dirAfter = liveDir()
    assert(dirAfter != dirBefore, "compaction did not land a new version")
    assert(fileCount(dirAfter) < filesBefore,
      s"compaction did not reduce live files ($filesBefore)")
    assert(dirBefore.exists,
      "previous version not retained for in-flight readers")
    val idx2 = IncrementalAnnIndex.index(spark, statePath).get
    assert(idx2.count() == n * P.tables)
    val after = IncrementalAnnIndex.annTopK(spark, statePath,
        "vec_id", "embedding", q, 10, P)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == ref)
  }

  test("probe is a pruned read: directory filter on pb, tb skip inside") {
    val (corpus, q) = corpusAndQuery()
    val statePath = Files.createTempDirectory("graft-incann-p").toString
    IncrementalAnnIndex.processBatch(corpus, "vec_id", "embedding",
      statePath, P)

    val probe = IncrementalAnnIndex.annTopK(spark, statePath,
      "vec_id", "embedding", q, 10, P)
    val plan = probe.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = plan.collectFirst { case f: FileSourceScanExec => f }.get
    val pf = scan.metadata("PartitionFilters")
    assert(pf.contains("pb"), s"probe not directory-pruned: $pf")
    assert(scan.metadata("PushedFilters").contains("tb") ||
      scan.dataFilters.exists(_.references.exists(_.name == "tb")),
      "tb predicate must reach the scan for footer-stat skipping")

    // new vectors are searchable immediately after their batch: a
    // vector identical to the query lands and becomes the top hit
    val probeVec = Seq((999999L, q)).toDF("vec_id", "embedding")
    IncrementalAnnIndex.processBatch(probeVec, "vec_id", "embedding",
      statePath, P)
    val top = IncrementalAnnIndex.annTopK(spark, statePath,
      "vec_id", "embedding", q, 1, P).head()
    assert(top.getLong(0) == 999999L && top.getDouble(1) == 1.0)
  }

  test("probe volume stays ~flat at 10x corpus when planes grow with log n") {
    // The LSH scale discipline (EmbeddingScaleBench's planted mode,
    // BENCH_NOTES): per-table bucket occupancy is n/2^planes, so
    // planes must grow with log n. Two maintained indexes — 10x the
    // vectors with +4 planes — must give a probe that reads about the
    // same number of candidate rows, not 10x. Deterministic vectors;
    // params are baked per state dir, as documented.
    def vecs(seed: Int, from: Int, n: Int) = {
      val rnd = new scala.util.Random(seed)
      (from until from + n).map(i =>
          (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
    }
    val q = {
      val rnd = new scala.util.Random(99)
      Seq.fill(16)(rnd.nextGaussian().toFloat)
    }
    val small = IncrementalAnnIndex.Params(numPlanes = 4, tables = 4,
      indexBuckets = 8)
    val big = IncrementalAnnIndex.Params(numPlanes = 8, tables = 4,
      indexBuckets = 32)
    val s1 = Files.createTempDirectory("graft-incann-g1").toString
    val s2 = Files.createTempDirectory("graft-incann-g2").toString
    IncrementalAnnIndex.processBatch(vecs(1, 0, 200), "vec_id", "embedding",
      s1, small)
    (0 until 4).foreach(b => IncrementalAnnIndex.processBatch(
      vecs(100 + b, b * 500, 500), "vec_id", "embedding", s2, big))

    def candRows(statePath: String, p: IncrementalAnnIndex.Params): Long = {
      val probes = IncrementalAnnIndex.probeTbs(q, p)
      IncrementalAnnIndex.index(spark, statePath).get
        .filter(col("tb").isin(probes: _*)).count()
    }
    val r1 = candRows(s1, small)
    val r2 = candRows(s2, big)
    val i2 = IncrementalAnnIndex.index(spark, s2).get.count()
    assert(i2 == 2000L * big.tables, s"big index wrong size: $i2")
    // expected ≈ tables·(planes+1)·n/2^planes: 4·5·200/16 = 250 vs
    // 4·9·2000/256 ≈ 281 — flat within hash noise; bound at 2x + slack
    assert(r2 <= 2 * r1 + 100, s"probe volume grew with corpus: $r1 -> $r2")
    assert(r2 <= i2 / 4, s"probe read $r2 of $i2 index rows — no pruning")
  }
}
