package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Converts the two hash-based no_oracle dedup queries (d02 minhash,
  * d03 simhash) from random-corpus property tests into HARD invariants
  * on the SHIPPED testdata:
  *
  *  - d02 ⊆ the exact global 1-gram jaccard pair set with IDENTICAL
  *    jaccard values (verification is exact, so false pairs are
  *    impossible), and recall ≥ a pinned floor. The floor is low by
  *    design: this corpus is hyper-degenerate (41% of ALL doc pairs at
  *    sf0.1 are true near-dups on a 31-token vocabulary), so the
  *    maxBucket skew cap — the guard that keeps the operator alive at
  *    100 TB — legitimately drops most of the quadratic true-pair
  *    output. On a corpus this dense the right tool is clusters
  *    (d05/d06), not pairs; the gate pins that the cap never invents
  *    or mis-scores a pair and that recall doesn't regress silently.
  *    (Measured: 0.5407 at sf0.01, 0.0539 at sf0.1 — MinhashRecall.)
  *
  *  - d03 == the brute-force Hamming-≤3 pair set EXACTLY on sf0.01 and
  *    sf0.1: the chunk pigeonhole makes recall complete unless a
  *    bucket trips maxBucket, and the shipped corpora never trip it
  *    (SimhashRecall).
  */
class DedupRecallGateSpec extends AnyFunSuite {
  import SparkTestSession._

  test("d02 ⊆ exact jaccard pairs, identical values, recall ≥ 0.5 (sf0.01)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()
    val toks = docs.select(col("doc_id"),
      array_distinct(TextFunctions.tokens(col("text"))).as("w"))
    val exact = Dedup.jaccardJoinExact(toks, "doc_id", "w", 0.7, Nil).cache()
    val d02 = Dedup.nearDuplicates(docs, "doc_id", "text",
      shingleLen = 1, numHashes = 32, numBands = 4, threshold = 0.7,
      maxBucket = 200).cache()
    val nExact = exact.count()
    val nD02 = d02.count()
    val extra = d02.join(exact, Seq("a", "b"), "left_anti").count()
    assert(extra == 0, s"d02 invented $extra pairs absent from the exact set")
    val valueMismatch = d02
      .join(exact.withColumnRenamed("jaccard", "__jx"), Seq("a", "b"))
      .filter(col("jaccard") =!= col("__jx")).count()
    assert(valueMismatch == 0, s"$valueMismatch pairs scored differently")
    val recall = nD02.toDouble / nExact
    assert(recall >= 0.5, f"d02 recall regressed: $recall%.4f (< 0.5 floor)")
    docs.unpersist(); exact.unpersist(); d02.unpersist()
  }

  test("d03 == brute-force Hamming-≤3 pairs exactly (sf0.01 + sf0.1)") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
      val sigs = Dedup.simhashSignaturesPacked(docs, "doc_id", "text").cache()
      val x = sigs.select(col("doc_id").as("a"), col("__sig").as("__sx"))
      val y = sigs.select(col("doc_id").as("b"), col("__sig").as("__sy"))
      val exact = x.join(y, col("a") < col("b"))
        .withColumn("hamming",
          bit_count(col("__sx").bitwiseXOR(col("__sy"))).cast("int"))
        .filter(col("hamming") <= 3)
        .select("a", "b", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val d03 = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(exact.nonEmpty, s"$dir: degenerate gate — no close pairs")
      assert(d03 == exact,
        s"$dir: missed ${(exact -- d03).take(5)} extra ${(d03 -- exact).take(5)}")
      docs.unpersist(); sigs.unpersist()
    }
  }
}
