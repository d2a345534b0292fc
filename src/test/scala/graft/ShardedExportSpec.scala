package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ShardedExport
import graft.sources.TestData
import graft.text.TextFunctions

/** The materialized export writer: deterministic shard layout,
  * manifest-gated visibility, format round-trips. */
class ShardedExportSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = TestData.table(spark, sf, "documents")
    .select("doc_id", "text", "source")

  test("parquet round trip: content, shard assignment, manifest") {
    val dir = Files.createTempDirectory("graft-export").toString
    val m = ShardedExport.writeShards(docs, "doc_id", dir, numShards = 8)
    assert(m.totalRows == docs.count())
    assert(m.shards.values.sum == m.totalRows)
    assert(m.shards.keySet.subsetOf((0 until 8).toSet))

    val back = ShardedExport.readShards(spark, dir).get
    // content survives (modulo the added shard column)
    assert(back.drop("shard").exceptAll(docs).isEmpty &&
      docs.exceptAll(back.drop("shard")).isEmpty)
    // every row sits in ITS key's shard — the c08 formula, not
    // whatever partition it happened to be in
    val misplaced = back.filter(
      col("shard") =!= TextFunctions.md5Bucket(col("doc_id"), 8)).count()
    assert(misplaced == 0)
    // manifest parses back to what writeShards returned
    assert(ShardedExport.manifest(spark, dir).get == m)
    // shard directories prune on read
    val one = ShardedExport.readShards(spark, dir).get
      .filter(col("shard") === 3)
    assert(one.count() == m.shards.getOrElse(3, 0L))
  }

  test("jsonl round trip preserves rows") {
    val dir = Files.createTempDirectory("graft-export-j").toString
    val m = ShardedExport.writeShards(docs, "doc_id", dir, 4, "json")
    val back = ShardedExport.readShards(spark, dir, "json").get
      .select("doc_id", "text", "source", "shard")
    assert(back.count() == m.totalRows)
    val orig = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    val got = back.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("source"))).sortBy(_._1).toSeq
    assert(got == orig)
  }

  test("exports are deterministic: same corpus, same shard sets") {
    val d1 = Files.createTempDirectory("graft-export-a").toString
    val d2 = Files.createTempDirectory("graft-export-b").toString
    ShardedExport.writeShards(docs, "doc_id", d1, 8)
    ShardedExport.writeShards(docs.repartition(13), "doc_id", d2, 8)
    val a = ShardedExport.readShards(spark, d1).get
      .select("shard", "doc_id").collect().map(_.toString).sorted.toSeq
    val b = ShardedExport.readShards(spark, d2).get
      .select("shard", "doc_id").collect().map(_.toString).sorted.toSeq
    assert(a == b, "shard assignment depended on input partitioning")
  }

  test("manifest counts are pinned to the written files, not a re-evaluation") {
    import spark.implicits._
    // An evaluation-unstable frame: the filter admits exactly the
    // first 60 rows it EVER evaluates (process-global counter), so the
    // data-write job keeps 60 rows and any later re-aggregation of the
    // same frame would keep 0 — a manifest computed from the input
    // frame would claim 0 rows over 60 on disk.
    ShardedExportSpec.evalCounter.set(0L)
    val keep = udf { () =>
      ShardedExportSpec.evalCounter.getAndIncrement() < 60L
    }.asNondeterministic()
    val unstable = (0L until 200L).toDF("doc_id")
      .withColumn("text", concat(lit("doc "), col("doc_id")))
      .filter(keep())
    val dir = Files.createTempDirectory("graft-export-n").toString
    val m = ShardedExport.writeShards(unstable, "doc_id", dir, 4)
    val onDisk = ShardedExport.readShards(spark, dir).get
    assert(m.totalRows == onDisk.count(),
      s"manifest total ${m.totalRows} != files ${onDisk.count()}")
    val perShard = onDisk.groupBy("shard").count().collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    assert(m.shards == perShard)
  }

  test("a 0-row export commits an empty manifest (both formats)") {
    // partitionBy writes no data files for an empty frame, so the
    // count-back read must use the known schema instead of inference
    // (which throws over an empty dir) — regression for the case where
    // an upstream filter legitimately keeps nothing.
    for (fmt <- Seq("parquet", "json")) {
      val dir = Files.createTempDirectory(s"graft-export-0$fmt").toString
      val m = ShardedExport.writeShards(
        docs.filter(lit(false)), "doc_id", dir, 4, fmt)
      assert(m.totalRows == 0L && m.shards.isEmpty)
      assert(ShardedExport.manifest(spark, dir).contains(m))
    }
  }

  test("a crashed export (no manifest) is invisible") {
    val dir = Files.createTempDirectory("graft-export-c").toString
    // simulate: data written, manifest never landed
    docs.withColumn("shard", TextFunctions.md5Bucket(col("doc_id"), 4))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    assert(ShardedExport.readShards(spark, dir).isEmpty)
    assert(ShardedExport.manifest(spark, dir).isEmpty)
  }
}

object ShardedExportSpec {
  // test-only: drives the evaluation-unstable frame above (udf closures
  // capture this via the companion so local-mode executors share it)
  val evalCounter = new java.util.concurrent.atomic.AtomicLong(0L)
}
