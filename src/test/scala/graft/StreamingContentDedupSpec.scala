package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.streaming.IncrementalEmbeddingDedup

/** Streaming content-level dedup over BINARY assets: micro-batches of
  * raw bytes are embedded in-stream with the codegen byte-n-gram
  * feature hash and folded into the maintained embedding-cluster
  * state — the streaming form of the m03 batch query. At a
  * duplicate-grade threshold (0.999 ≫ the corpus's closest natural
  * byte-cosine pair ≈ 0.97, margin pinned in FeatureHashSpec), the
  * converged clusters must equal the EXACT content groups: every
  * planted copy labeled with its source, everything else a
  * singleton. */
class StreamingContentDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streaming binary assets converge to exact-content groups") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val planted = docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(pmod(col("doc_id"), lit(50)) === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
    val statePath = Files.createTempDirectory("graft-inccontent").toString
    val params = IncrementalEmbeddingDedup.Params(threshold = 0.999)

    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    // the embedding is computed IN-STREAM (scan-local codegen
    // expression over the binary content), so the maintainer only
    // ever sees (id, vector) — the exact shape a learned-model
    // embedding stage would hand it
    val vecs = stream.toDS().toDF("asset_id", "text")
      .select(col("asset_id"),
        Multimodal.featureEmbed(
          to_binary(col("text"), lit("utf-8")), 64).as("v"))
    val q = IncrementalEmbeddingDedup.attach(
      vecs, "asset_id", "v", statePath, params,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    val all = planted.as[(Long, String)].collect().sortBy(_._1)
    all.grouped(math.max(1, all.length / 4)).foreach { b =>
      stream.addData(b.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    val got = IncrementalEmbeddingDedup.clusters(
        planted.select(col("doc_id").as("asset_id")), "asset_id", statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // expected: md5-content groups, min id as label
    val byMd5 = planted.select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val label = byMd5.groupBy(_._2).map { case (h, g) =>
      h -> g.map(_._1).min }
    val expected = byMd5.map { case (id, h) => id -> label(h) }.toMap
    assert(got == expected)
    // the planting genuinely exercised cross-batch merging: copies
    // arrive in the last batch, their sources in earlier ones
    assert(expected.count { case (id, lab) => id != lab } >= 2)
  }
}
